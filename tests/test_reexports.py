"""SPEC E8b/E8c/C2b/L1b: re-export chains + namespace-member calls.

Golden fixtures pin the spec; the end-to-end test proves the engine's
distributed L1b stage (linking.synthesize_reexports — per-repo wildcard
BFS over pre-filtered metadata) emits exactly the golden triple set.
"""

import pyarrow as pa
import pytest

from hikma_engine_ray.golden import golden_extract


def _corpus(files: dict[str, str], commit: str = "c1", repo: str = "r/r"):
    rows = [
        {"repo": repo, "path": p, "commit": commit, "lang": "ts", "content": c}
        for p, c in files.items()
    ]
    return pa.table({k: [r[k] for r in rows] for k in rows[0]})


def _gold_triples(tbl):
    nodes, triples, dangling = golden_extract(tbl)
    return {n["node_id"]: n for n in nodes}, triples, dangling


BASIC = {
    "src/impl.ts": "export function fn1() { return 1; }\nexport class K {}\n",
    "src/mid.ts": "export { fn1 as fnA } from './impl';\nexport * from './impl';\n",
    "src/barrel/index.ts": "export * from '../mid';\n",
    "src/use.ts": (
        "import { fnA } from './barrel';\n"
        "import * as NS from './impl';\n"
        "export function caller() { fnA(); NS.fn1(); NS.noSuch(); }\n"
    ),
}


def test_golden_named_and_star_chain():
    nodes, triples, dangling = _gold_triples(_corpus(BASIC))
    calls = [
        (nodes[t[0]]["name"], nodes[t[2]]["name"])
        for t in triples
        if t[1] == "CALLS"
    ]
    # fnA resolves barrel -> mid(named alias) -> impl.fn1; NS.fn1 direct
    assert calls == [("caller", "fn1")]
    assert [(m["symbol"], m["kind"]) for m in dangling] == [("noSuch", "call")]


def test_golden_shadowing_and_alias():
    files = {
        "src/a.ts": "export function f() { return 'a'; }\n",
        "src/b.ts": (
            "export function f() { return 'b'; }\n"
            "export * from './a';\n"  # direct f shadows re-exported f
        ),
        "src/c.ts": "export { f as g } from './b';\n",
        "src/use.ts": (
            "import { g } from './c';\n"
            "export function u() { g(); }\n"
        ),
    }
    nodes, triples, _ = _gold_triples(_corpus(files))
    tgt = [nodes[t[2]] for t in triples if t[1] == "CALLS"]
    assert len(tgt) == 1
    assert tgt[0]["name"] == "f"
    # resolves to b.ts's own f (line 1 of b.ts), not a.ts's
    b_f = [
        n for n in nodes.values()
        if n["node_type"] == "Function" and n.get("start_line") == 1
    ]
    assert any(
        t[2] == n["node_id"] for t in triples if t[1] == "CALLS" for n in b_f
    )


def test_golden_cycle_terminates_and_resolves():
    files = {
        "src/a.ts": "export * from './b';\nexport function onlyA() {}\n",
        "src/b.ts": "export * from './a';\nexport function onlyB() {}\n",
        "src/use.ts": (
            "import { onlyB } from './a';\n"
            "import { ghost } from './a';\n"
            "export function u() { onlyB(); ghost(); }\n"
        ),
    }
    nodes, triples, dangling = _gold_triples(_corpus(files))
    called = {nodes[t[2]]["name"] for t in triples if t[1] == "CALLS"}
    assert called == {"onlyB"}
    assert [m["symbol"] for m in dangling] == ["ghost"]


def test_golden_stale_version_reexports_ignored():
    rows = [
        # older version of mid.ts re-exported; the latest does not
        {"repo": "r/r", "path": "src/impl.ts", "commit": "c1", "lang": "ts",
         "content": "export function fn1() { return 1; }\n"},
        {"repo": "r/r", "path": "src/mid.ts", "commit": "c1", "lang": "ts",
         "content": "export * from './impl';\n"},
        {"repo": "r/r", "path": "src/mid.ts", "commit": "c2", "lang": "ts",
         "content": "export const unrelated = 1;\n"},
        {"repo": "r/r", "path": "src/use.ts", "commit": "c2", "lang": "ts",
         "content": "import { fn1 } from './mid';\nexport function u() { fn1(); }\n"},
    ]
    tbl = pa.table({k: [r[k] for r in rows] for k in rows[0]})
    nodes, triples, dangling = _gold_triples(tbl)
    assert not [t for t in triples if t[1] == "CALLS"]
    assert [m["symbol"] for m in dangling] == ["fn1"]


def test_golden_member_call_exclusions():
    files = {
        "src/impl.ts": "export function fn1() {}\n",
        "src/use.ts": (
            "import * as NS from './impl';\n"
            "const obj = { NS: { fn1: () => 1 } };\n"
            "export function u() { obj.NS.fn1(); x.NS.fn1(); NS.fn1(); }\n"
        ),
    }
    nodes, triples, dangling = _gold_triples(_corpus(files))
    # only the direct two-part NS.fn1() resolves; chained a.b.c( is silent
    calls = [t for t in triples if t[1] == "CALLS"]
    assert len(calls) == 1
    assert dangling == []


@pytest.mark.parametrize("fixture", ["basic", "shadow", "cycle", "deep"])
def test_engine_matches_golden_reexports(ray_session, fixture):
    """End-to-end: build_graph's distributed L1b == golden, triple-exact."""
    import ray.data as rd

    from hikma_engine_ray.pipelines.index_pipeline import build_graph

    files = {
        "basic": BASIC,
        "shadow": {
            "src/a.ts": "export function f() { return 'a'; }\n",
            "src/b.ts": "export function f() { return 'b'; }\nexport * from './a';\n",
            "src/c.ts": "export { f as g } from './b';\n",
            "src/use.ts": "import { g } from './c';\nexport function u() { g(); }\n",
        },
        "cycle": {
            "src/a.ts": "export * from './b';\nexport function onlyA() {}\n",
            "src/b.ts": "export * from './a';\nexport function onlyB() {}\n",
            "src/use.ts": (
                "import { onlyB } from './a';\nimport { ghost } from './a';\n"
                "export function u() { onlyB(); ghost(); }\n"
            ),
        },
        "deep": {
            "src/l0.ts": "export function deep() {}\n",
            **{
                f"src/l{i}.ts": f"export * from './l{i-1}';\n"
                for i in range(1, 7)
            },
            "src/use.ts": (
                "import { deep } from './l6';\nexport function u() { deep(); }\n"
            ),
        },
    }[fixture]
    tbl = _corpus(files)
    g = build_graph(rd.from_arrow(tbl), embed=False, adjacency=False)
    eng = {(r["subj"], r["pred"], r["obj"]) for r in g["triples"].take_all()}
    _, gold, gold_dangling = golden_extract(tbl)
    assert eng == gold, (
        sorted(eng - gold)[:10], sorted(gold - eng)[:10]
    )
    eng_dangling = {
        (r["module"], r["symbol"], r["mkind"])
        for r in g["dangling"].take_all()
    }
    assert eng_dangling == {
        (m["module"], m["symbol"], m["kind"]) for m in gold_dangling
    }
