"""Reference-parity stats: clone report, embedding coverage, complexity."""

import hashlib

import pytest


@pytest.fixture(scope="module")
def nodes(built_graph):
    return built_graph["nodes"].materialize()


def test_signature_hash_matches_reference_scheme():
    import pyarrow as pa

    from hikma_engine_ray.stages.stats import add_signature_hash

    t = pa.table(
        {
            "node_type": pa.array(["Function", "Function"]),
            "name": pa.array(["util0", None]),
            "signature": pa.array(["util0(x)", None]),
        }
    )
    out = add_signature_hash(t)
    # md5("Function:util0:util0(x)") — data-loader.ts:193-197 scheme
    assert out["signature_hash"][0].as_py() == hashlib.md5(
        b"Function:util0:util0(x)"
    ).hexdigest()
    assert out["signature_hash"][1].as_py() == hashlib.md5(b"Function::").hexdigest()


def test_clone_groups_find_cross_repo_clones(ray_session, nodes):
    """util0..util7 have identical (type, name, signature) in every repo
    → each must appear as one clone group with n_clones == n_repos."""
    from hikma_engine_ray.stages.stats import clone_groups

    rows = clone_groups(nodes).take_all()
    assert rows, "no clone groups found"
    by_hash = {r["signature_hash"]: r for r in rows}
    # derive the expected hash for util0 from a real node row
    util0 = next(
        r
        for r in nodes.take_all()
        if r["name"] == "util0" and r["node_type"] == "Function"
    )
    expect = hashlib.md5(
        f"Function:util0:{util0['signature']}".encode()
    ).hexdigest()
    assert expect in by_hash
    n_repos = len({r["repo"] for r in nodes.take_all() if r["node_type"] == "File"})
    assert by_hash[expect]["n_clones"] == n_repos
    assert by_hash[expect]["example_id"]  # deterministic representative


def test_embedding_coverage(ray_session, nodes):
    from hikma_engine_ray.stages.stats import embedding_coverage

    rows = embedding_coverage(nodes).take_all()
    by_type = {r["node_type"]: r for r in rows}
    assert by_type["Function"]["n_total"] > 0
    # the default pipeline embeds every node → full coverage
    for r in rows:
        assert r["n_embedded"] == r["n_total"]
        assert r["coverage"] == 1.0

    # nodes without the embedding column → zero coverage
    bare = nodes.drop_columns(["embedding"])
    rows0 = embedding_coverage(bare).take_all()
    assert all(r["n_embedded"] == 0 and r["coverage"] == 0.0 for r in rows0)


def test_top_paths(ray_session, nodes):
    from hikma_engine_ray.stages.stats import top_paths

    rows = top_paths(nodes, k=20).take_all()
    assert 0 < len(rows) <= 20
    counts = [r["n"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    # cross-check the winner against a driver-side count
    from collections import Counter

    manual = Counter(
        r["path"] for r in nodes.take_all() if r["path"] is not None
    )
    top_path, top_n = max(sorted(manual.items()), key=lambda kv: kv[1])
    assert rows[0]["n"] == top_n
    assert manual[rows[0]["path"]] == top_n


def test_function_complexity(ray_session, nodes):
    from hikma_engine_ray.stages.stats import function_complexity

    rows = function_complexity(nodes).take_all()
    assert rows
    for r in rows:
        assert r["n_functions"] > 0
        assert 1 <= r["avg_loc"] <= r["max_loc"]
    langs = {r["lang"] for r in rows}
    assert "typescript" in langs


def test_distinct_count(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from hikma_engine_ray.stages.agg import distinct_count

    t = pa.table({
        "g": ["x", "x", "x", "y", "y", None],
        "v": ["a", "a", "b", "a", None, "a"],
    })
    ds = rd.from_arrow(t)
    grouped = {r["g"]: r["n"] for r in distinct_count(ds, ["v"], ["g"]).take_all()}
    assert grouped == {"x": 2, "y": 2, None: 1}  # NULL value counts as a key
    total = distinct_count(ds, ["v"])  # ungrouped → 1-row DataFrame
    # distinct v values = {a, b, None}
    assert total["n"].tolist() == [3]


def test_hll_distinct_accuracy(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from hikma_engine_ray.stages.agg import hll_distinct

    # 20k rows, 7777 distinct values, spread over multiple blocks
    vals = [f"v{i % 7777}" for i in range(20000)]
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(8)
    est = int(hll_distinct(ds, ["v"])["n"].iloc[0])
    assert abs(est - 7777) / 7777 < 0.05  # p=14 → ~0.8% typical error
    # small-range linear counting path
    small = rd.from_arrow(pa.table({"v": [f"s{i}" for i in range(50)]}))
    est2 = int(hll_distinct(small, ["v"])["n"].iloc[0])
    assert est2 == 50
