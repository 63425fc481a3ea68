from hikma_engine_ray.golden import golden_extract, parse_file, precision_recall
from hikma_engine_ray.ids import entity_id, file_id
from hikma_engine_ray.sources.corpus import generate_corpus


def test_corpus_deterministic():
    a = generate_corpus(200)
    b = generate_corpus(200)
    assert a.equals(b)
    assert a.schema.names == ["repo", "path", "commit", "lang", "content"]


def test_corpus_has_adversarial_rows():
    t = generate_corpus(200).to_pylist()
    paths = {r["path"] for r in t}
    assert "src/pkg0/empty.ts" in paths
    assert "src/pkg0/big.ts" in paths
    big = next(r for r in t if r["path"] == "src/pkg0/big.ts")
    assert len(big["content"]) > 1 << 20


def test_parse_file_spot_checks():
    src = "\n".join(
        [
            "import { helper } from './lib';",
            "",
            "function foo(a, b) {",
            "  return bar(a) + helper(b);",
            "}",
            "",
            "async function bar(x) {",
            "  return x;",
            "}",
            "",
            "const baz = (x) => foo(x, 1);",
            "",
            "class A {",
            "  run(x) {",
            "    return bar(x);",
            "  }",
            "}",
            "",
            "class B extends A {",
            "}",
            "",
            "export { foo, baz };",
        ]
    )
    ents, triples, mentions, exported, _ = parse_file("r/r", "src/m.ts", "c1", src)
    by = {(e.kind, e.name): e for e in ents}
    foo = by[("Function", "foo")]
    assert (foo.start_line, foo.end_line, foo.start_col) == (3, 5, 0)
    assert foo.signature == "function foo(a, b)"
    bar = by[("Function", "bar")]
    assert bar.signature == "async function bar(x)"
    baz = by[("ArrowFunction", "baz")]
    assert baz.start_line == baz.end_line == 11
    assert baz.signature == "const baz = (x)"
    assert ("Method", "run") in by
    a, b = by[("Class", "A")], by[("Class", "B")]
    spo = {(t[0], t[1], t[2]) for t in triples}
    fid = file_id("r/r", "c1", "src/m.ts")
    assert (foo.eid, "CALLS", bar.eid) in spo
    assert (baz.eid, "CALLS", foo.eid) in spo
    assert (by[("Method", "run")].eid, "CALLS", bar.eid) in spo
    assert (b.eid, "EXTENDS", a.eid) in spo
    assert (a.eid, "CONTAINS", by[("Method", "run")].eid) in spo
    assert (fid, "EXPORTS", foo.eid) in spo
    assert set(exported) == {"foo", "baz"}
    # cross-file mention for helper()
    assert any(m["symbol"] == "helper" and m["kind"] == "call" for m in mentions)


def test_test_file_yields_testcase():
    ents, _, _, _, _ = parse_file(
        "r/r", "src/__tests__/a.test.ts", "c1", "function test_x() {\n  return 1;\n}\n"
    )
    assert [e.kind for e in ents] == ["TestCase"]


def test_golden_extract_counts():
    corpus = generate_corpus(200)
    nodes, triples, dangling = golden_extract(corpus)
    types = {n["node_type"] for n in nodes}
    assert {"Repository", "Commit", "File", "Function", "ArrowFunction", "Class",
            "Interface", "Method", "Import", "Export", "Variable", "TestCase"} <= types
    preds = {t[1] for t in triples}
    assert {"CONTAINS", "DEFINED_IN", "CALLS", "IMPORTS", "EXPORTS", "EXTENDS",
            "IMPLEMENTS", "MODIFIED_IN", "HAS_COMMIT", "TESTED_BY"} <= preds
    assert dangling == []


def test_precision_recall_math():
    g = {("a", "P", "b"), ("c", "P", "d")}
    e = {("a", "P", "b"), ("x", "P", "y")}
    pr = precision_recall(e, g)
    assert pr["precision"] == 0.5 and pr["recall"] == 0.5


def test_spec_v2_constructs():
    """SPEC v2: block comments, template literals, multi-line
    import/export, decorators, external-call mentions."""
    src = "\n".join(
        [
            "import {",
            "  aid,",
            "  bid,",
            "} from './lib';",
            "import axios from 'axios';",
            "",
            "/* block comment with a brace {",
            "   and a fake_call(1) spanning lines */",
            "function outer(x) {",
            "  const t = `template { with brace and ${x} interp and ghost(2)`;",
            "  // line comment calling ghost2(3)",
            "  return aid(x) + axios(x);",
            "}",
            "",
            "@Injectable()",
            "class Svc {",
            "  @Get()",
            "  handle(x) {",
            "    return outer(x);",
            "  }",
            "}",
            "",
            "export {",
            "  outer,",
            "};",
        ]
    )
    ents, triples, mentions, exported, _ = parse_file("r/r", "src/svc.ts", "c1", src)
    by = {(e.kind, e.name): e for e in ents}

    # multi-line import parsed: one Import entity, locals recorded
    imp = by[("Import", "./lib")]
    assert imp.start_line == 1 and imp.end_line == 4
    # block comment: no entity/call extracted from its text; outer's
    # end_line is unaffected by the '{' inside the comment
    outer = by[("Function", "outer")]
    assert outer.end_line == 13
    spo = {(t[0], t[1], t[2]) for t in triples}
    callees = {t[2] for t in spo if t[1] == "CALLS"}
    # no calls from comment or template text
    assert not any("ghost" in str(c) or "fake" in str(c) for c in callees)
    # calls to imported names become mentions — INCLUDING the external one
    ms = {(m["module"], m["symbol"], m["kind"]) for m in mentions}
    assert ("./lib", "aid", "call") in ms
    assert ("axios", "axios", "call") in ms  # external spec dangles later
    # decorators attach to class and method; not treated as calls
    svc = by[("Class", "Svc")]
    assert svc.props.get("decorators") == ["Injectable"]
    handle = by[("Method", "handle")]
    assert handle.props.get("decorators") == ["Get"]
    assert not any(c in ("Injectable", "Get") for c in callees)
    assert (handle.eid, "CALLS", outer.eid) in spo
    # multi-line export resolved
    assert "outer" in exported


def test_spec_v2_external_mentions_dangle():
    """External-spec call mentions land in the dangling report, never in
    triples (golden_extract end-to-end)."""
    import pyarrow as pa

    from hikma_engine_ray.schemas import CORPUS

    rows = [
        {
            "repo": "r/r", "path": "src/a.ts", "commit": "c1",
            "lang": "typescript",
            "content": "import axios from 'axios';\n"
                       "function f(x) {\n  return axios(x);\n}\n",
        }
    ]
    corpus = pa.Table.from_pylist(rows, schema=CORPUS)
    _, triples, dangling = golden_extract(corpus)
    assert not any(t[1] == "CALLS" for t in triples)
    assert any(d["module"] == "axios" and d["kind"] == "call" for d in dangling)


def test_jsdoc_docstrings():
    """SPEC P7: JSDoc attaches to the following declaration (through
    blank lines and decorators), normalized like ts jsDoc[0].comment;
    plain block comments and detached JSDoc do not attach. Engine and
    golden must agree."""
    import json

    import pyarrow as pa

    from hikma_engine_ray.schemas import CORPUS
    from hikma_engine_ray.stages.file_meta import file_meta_batch
    from hikma_engine_ray.stages.parser import ParseFiles

    src = "\n".join(
        [
            "/**",
            " * Adds two numbers.",
            " * @param a first",
            " */",
            "function add(a, b) {",
            "  return a + b;",
            "}",
            "",
            "/** One-liner doc */",
            "",
            "@Injectable()",
            "class Svc {",
            "  /** method doc */",
            "  handle(x) {",
            "    return add(x, 1);",
            "  }",
            "}",
            "",
            "/* not a jsdoc */",
            "function bare(x) {",
            "  return x;",
            "}",
            "",
            "/** detached doc */",
            "const y = 1;",
            "function after(x) {",
            "  return x;",
            "}",
        ]
    )
    repo, path, commit = "r/r", "src/doc.ts", "c1"
    ents, *_ = parse_file(repo, path, commit, src)
    gold = {(e.kind, e.name): e.props.get("docstring") for e in ents}
    assert gold[("Function", "add")] == "Adds two numbers.\n@param a first"
    assert gold[("Class", "Svc")] == "One-liner doc"  # through blank+decorator
    assert gold[("Method", "handle")] == "method doc"
    assert gold[("Function", "bare")] is None  # /* */ is not JSDoc
    assert gold[("Function", "after")] is None  # detached by real code
    assert gold[("Variable", "y")] == "detached doc"

    t = pa.Table.from_pylist(
        [{"repo": repo, "path": path, "commit": commit,
          "lang": "typescript", "content": src}],
        schema=CORPUS,
    )
    out = ParseFiles()(file_meta_batch(t)).to_pylist()
    eng = {}
    for r in out:
        if r["kind"] == "node" and r["props_json"]:
            eng[(r["node_type"], r["name"])] = json.loads(r["props_json"]).get(
                "docstring"
            )
    for key, want in gold.items():
        assert eng.get(key) == want, (key, want, eng.get(key))
