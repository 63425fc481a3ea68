import hashlib

import pyarrow.compute as pc
import pytest


def test_engine_matches_golden(built_graph, small_corpus):
    """The north-rule gate: P/R >= 0.95 vs the golden oracle (we hold 1.0)."""
    from hikma_engine_ray.golden import golden_extract, precision_recall

    eng = {
        (r["subj"], r["pred"], r["obj"]) for r in built_graph["triples"].take_all()
    }
    _, gold, _ = golden_extract(small_corpus)
    pr = precision_recall(eng, gold)
    assert pr["precision"] >= 0.95, pr
    assert pr["recall"] >= 0.95, pr
    for pred, d in pr["per_predicate"].items():
        assert d["precision"] >= 0.95 and d["recall"] >= 0.95, (pred, d)


def test_sha256_invariant(built_graph, small_corpus):
    """Per-row invariant (BASELINE.json): content sha256 equality."""
    from hikma_engine_ray.ids import file_id

    files = {
        r["node_id"]: r["content_sha256"]
        for r in built_graph["nodes"].take_all()
        if r["node_type"] == "File"
    }
    checked = 0
    for r in small_corpus.to_pylist():
        fid = file_id(r["repo"], r["commit"], r["path"])
        data = r["content"].encode()
        if len(data) > 1 << 20:
            assert fid not in files  # oversize filtered (config/index.ts:128)
            continue
        assert files[fid] == hashlib.sha256(data).hexdigest()
        checked += 1
    assert checked > 100


def test_node_dedup_unique_ids(built_graph):
    import collections

    ids = [r["node_id"] for r in built_graph["nodes"].take_all()]
    dup = [k for k, v in collections.Counter(ids).items() if v > 1]
    assert dup == []


def test_triples_unique(built_graph):
    import collections

    spo = [
        (r["subj"], r["pred"], r["obj"]) for r in built_graph["triples"].take_all()
    ]
    dup = [k for k, v in collections.Counter(spo).items() if v > 1]
    assert dup == []


def test_triple_endpoints_exist(built_graph):
    """Property: every triple endpoint is a known node, an external
    module sink, or (READS/WRITES, SPEC v3 R4) the reference's
    placeholder variable key `{fid}#{name}#{line}` — the dangling-edge
    report semantics, J7."""
    node_ids = {r["node_id"] for r in built_graph["nodes"].take_all()}
    import re

    var_key = re.compile(r"^[0-9a-f]{20}#[^#]+#\d+$")
    for r in built_graph["triples"].take_all():
        assert r["subj"] in node_ids, r
        if r["pred"] in ("READS", "WRITES"):
            assert var_key.match(r["obj"]), r
        else:
            assert r["obj"] in node_ids or r["obj"].startswith("module:"), r


def test_embeddings_normalized(built_graph):
    import numpy as np

    rows = built_graph["nodes"].take(50)
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float32)
        assert v.shape == (384,)
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-3


def test_adjacency_consistent(built_graph):
    adj = built_graph["adjacency"].take_all()
    n_out = sum(len(r["out"]) for r in adj)
    n_in = sum(len(r["in"]) for r in adj)
    n_triples = built_graph["triples"].count()
    assert n_out == n_triples
    assert n_in == n_triples


def test_idempotent_rebuild(ray_session, small_corpus):
    """Deterministic content-addressed ids ⇒ a rerun yields the identical
    triple set (retry/resume safety)."""
    import ray.data as rd

    from hikma_engine_ray.pipelines.index_pipeline import build_graph

    g2 = build_graph(
        rd.from_arrow(small_corpus), embed=False, adjacency=False, nsalt=3
    )
    spo2 = {(r["subj"], r["pred"], r["obj"]) for r in g2["triples"].take_all()}
    # compare against a fresh run with different salt/bucket settings
    g3 = build_graph(
        rd.from_arrow(small_corpus), embed=False, adjacency=False, nsalt=1, nbuckets=7
    )
    spo3 = {(r["subj"], r["pred"], r["obj"]) for r in g3["triples"].take_all()}
    assert spo2 == spo3


def test_dangling_report(ray_session):
    """Importing a symbol the module never exports must land in the
    dangling report with a reason, not silently vanish."""
    import pyarrow as pa
    import ray.data as rd

    from hikma_engine_ray.pipelines.index_pipeline import build_graph
    from hikma_engine_ray.schemas import CORPUS

    rows = [
        {
            "repo": "o/r", "path": "src/a.ts", "commit": "c1", "lang": "typescript",
            "content": "import { nope } from './b';\nimport { yes } from './missing';\nfunction f() {\n  return nope(1);\n}\n",
        },
        {
            "repo": "o/r", "path": "src/b.ts", "commit": "c1", "lang": "typescript",
            "content": "function g() {\n  return 1;\n}\n",
        },
    ]
    corpus = pa.Table.from_pylist(rows, schema=CORPUS)
    g = build_graph(rd.from_arrow(corpus), embed=False, adjacency=False)
    dang = g["dangling"].take_all()
    reasons = {(d["symbol"] or d["module"], d["reason"]) for d in dang}
    assert ("nope", "no-such-symbol") in reasons
    assert ("./missing", "no-such-module") in reasons


def test_hot_key_salting_equivalence(ray_session, small_corpus):
    """Salted (threshold 0 ⇒ every key hot) and unsalted linking must
    produce identical triples."""
    import ray.data as rd

    from hikma_engine_ray.pipelines.index_pipeline import build_graph

    salted = build_graph(
        rd.from_arrow(small_corpus), embed=False, adjacency=False,
        nsalt=4, hot_threshold=0,
    )
    plain = build_graph(
        rd.from_arrow(small_corpus), embed=False, adjacency=False, nsalt=1
    )
    a = {(r["subj"], r["pred"], r["obj"]) for r in salted["triples"].take_all()}
    b = {(r["subj"], r["pred"], r["obj"]) for r in plain["triples"].take_all()}
    assert a == b


def test_empty_corpus(ray_session):
    """Zero-row corpus must build an empty graph without crashing
    (regression: find_hot_keys_exact KeyError on column-less frame)."""
    import ray.data as rd

    from hikma_engine_ray.schemas import CORPUS
    from hikma_engine_ray.pipelines.index_pipeline import build_graph

    g = build_graph(rd.from_arrow(CORPUS.empty_table()), embed=False)
    assert g["nodes"].count() == 0
    assert g["triples"].count() == 0


def test_pull_requests(built_graph, small_corpus):
    """J6: PR side table → PullRequest nodes + INCLUDES_COMMIT edges
    targeting real Commit nodes (git-analyzer.ts:264-310)."""
    import json

    from hikma_engine_ray.pipelines.index_pipeline import add_pull_requests
    from hikma_engine_ray.sources.corpus import (
        generate_commits_table,
        generate_prs_table,
    )

    commits = generate_commits_table(small_corpus)
    prs = generate_prs_table(commits, commits_per_pr=2)
    assert prs.num_rows > 0
    g = add_pull_requests(built_graph, prs)

    nodes = g["nodes"].take_all()
    pr_nodes = [n for n in nodes if n["node_type"] == "PullRequest"]
    assert len(pr_nodes) == prs.num_rows
    props = json.loads(pr_nodes[0]["props_json"])
    assert {"title", "author", "url", "body"} <= set(props)
    # embedding columns present (schema-consistent union)
    assert pr_nodes[0]["embedding"] is not None

    trips = g["triples"].take_all()
    inc = [t for t in trips if t["pred"] == "INCLUDES_COMMIT"]
    n_linked = sum(len(r["commit_shas"]) for r in prs.to_pylist())
    assert len(inc) == n_linked
    commit_ids = {n["node_id"] for n in nodes if n["node_type"] == "Commit"}
    pr_ids = {n["node_id"] for n in pr_nodes}
    assert all(t["subj"] in pr_ids and t["obj"] in commit_ids for t in inc)


def test_jsdoc_reaches_built_graph_props(built_graph):
    """P7 end-to-end: the fixture corpus now emits /** */ blocks, so
    docstrings must appear in node props_json after the full pipeline."""
    import json

    docs = [
        json.loads(r["props_json"]).get("docstring")
        for r in built_graph["nodes"].take_all()
        if r["node_type"] == "Function" and r["props_json"]
    ]
    with_doc = [d for d in docs if d]
    assert len(with_doc) > 10
    assert any("@param a base value" in d for d in with_doc)


def test_barrel_imports_resolve_in_built_graph(built_graph):
    """L1b end-to-end: mentions routed through pkg barrels (star + alias
    re-exports) resolve — no no-such-symbol dangling rows for them."""
    bad = [
        r for r in built_graph["dangling"].take_all()
        if r["module"].rstrip("/").endswith(tuple(f"pkg{p}" for p in range(4)))
    ]
    assert bad == []


def test_jsx_components_in_built_graph(built_graph):
    """P8 end-to-end: .tsx components flow through the full pipeline —
    View_* Function nodes exist, their cross-file f_*_0 calls resolve,
    and nothing from JSX tag/text ever becomes a node or call."""
    nodes = built_graph["nodes"].take_all()
    views = [r for r in nodes if r["node_type"] == "Function"
             and r["name"].startswith("View_")]
    assert len(views) > 0
    names = {r["name"] for r in nodes}
    assert not {n for n in names if n.startswith(("pseudo_call", "masked_call"))}
    view_ids = {r["node_id"] for r in views}
    by_id = {r["node_id"]: r["name"] for r in nodes}
    callees = {
        by_id.get(t["obj"], "")
        for t in built_graph["triples"].take_all()
        if t["pred"] == "CALLS" and t["subj"] in view_ids
    }
    # same-file fmt_* always called; cross-file f_*_0 resolves via linking
    assert any(c.startswith("fmt_") for c in callees)
    assert any(c.startswith("f_") and "_0" in c for c in callees)


def test_streaming_adjacency_degree_cap(ray_session, small_corpus):
    """VERDICT r4 item 8: streaming mode (materialize_triples=False)
    must cap high-degree nodes too — hot estimates now come from the
    link-prescan pass (no sampling of the lazy stream). With a tiny
    cap the repo/commit endpoints segment; summed degrees must equal
    the pinned path's exactly."""
    import ray.data as rd

    from hikma_engine_ray.pipelines.graph_query import degree_stats
    from hikma_engine_ray.pipelines.index_pipeline import (
        build_graph_from_tagged,
        parse_corpus,
    )

    tagged = parse_corpus(rd.from_arrow(small_corpus))
    stream = build_graph_from_tagged(
        tagged, embed=False, materialize_triples=False, degree_cap=40)
    rows = stream["adjacency"].take_all()
    segged = {r["node_id"] for r in rows if r["seg"] > 0}
    assert segged, "low cap must segment at least one structural node"
    assert all(
        len(r["out"]) + len(r["in"]) <= 40 * 3  # nseg headroom bound
        for r in rows if r["node_id"] in segged
    )

    pinned = build_graph_from_tagged(
        tagged, embed=False, materialize_triples=True, degree_cap=40)
    d_stream = {(r["node_id"]): (r["out_degree"], r["in_degree"])
                for r in degree_stats(stream["adjacency"]).take_all()}
    d_pinned = {(r["node_id"]): (r["out_degree"], r["in_degree"])
                for r in degree_stats(pinned["adjacency"]).take_all()}
    assert d_stream == d_pinned
