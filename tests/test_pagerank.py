"""PageRank gates: engine (both iteration shapes) vs a dense numpy
power-iteration reference; broadcast ≡ join path equivalence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _dense_pagerank(edges, damping=0.85, iters=10):
    """Serial dense reference with dangling-mass redistribution."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    for a, b in edges:
        M[idx[b], idx[a]] += 1.0
    outdeg = M.sum(axis=0)
    dangling = outdeg == 0
    cols = np.where(dangling, 1.0, outdeg)
    M = M / cols
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r = (1 - damping) / n + damping * (M @ r + r[dangling].sum() / n)
    return dict(zip(nodes, r))


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
    ("e", "d"), ("e", "c"), ("f", "f"), ("g", "a"),  # g dangles nowhere? g->a
    ("h", "c"),  # h has out-edge; i is a pure sink (dangling)
    ("c", "i"),
]


def _edges_ds():
    import ray.data as rd

    t = pa.table({
        "src": pa.array([a for a, _ in EDGES], pa.string()),
        "dst": pa.array([b for _, b in EDGES], pa.string()),
    })
    return rd.from_arrow(t).repartition(4)


def _as_dict(ds):
    df = ds.to_pandas()
    return dict(zip(df["node"], df["rank"]))


def test_pagerank_matches_dense_reference(ray_session):
    from hikma_engine_ray.stages.pagerank import pagerank

    got = _as_dict(pagerank(_edges_ds(), iters=10))
    want = _dense_pagerank(EDGES, iters=10)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9), k
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_join_path_equivalent(ray_session):
    from hikma_engine_ray.stages.pagerank import pagerank

    fast = _as_dict(pagerank(_edges_ds(), iters=6))
    # driver_limit=1 forces the fully distributed join iteration
    slow = _as_dict(pagerank(_edges_ds(), iters=6, driver_limit=1,
                             nbuckets=4))
    assert set(fast) == set(slow)
    for k in fast:
        assert slow[k] == pytest.approx(fast[k], rel=1e-9), k


def test_pagerank_sparse_reduce_equivalent(ray_session):
    """driver_edge_bytes=0 forces the per-block broadcast iteration;
    dense_limit_bytes=0 additionally forces its sparse groupby reduce.
    All three shapes (driver-resident, per-block dense, per-block
    sparse) are value-identical."""
    from hikma_engine_ray.stages.pagerank import pagerank

    driver = _as_dict(pagerank(_edges_ds(), iters=6))
    dense = _as_dict(pagerank(_edges_ds(), iters=6, driver_edge_bytes=0))
    sparse = _as_dict(pagerank(_edges_ds(), iters=6, driver_edge_bytes=0,
                               dense_limit_bytes=0))
    assert set(driver) == set(dense) == set(sparse)
    for k in dense:
        assert sparse[k] == pytest.approx(dense[k], rel=1e-12), k
        assert driver[k] == pytest.approx(dense[k], rel=1e-12), k


def test_kg_component_sizes_match_serial(ray_session, built_graph):
    """The kg_components query shape (hash node ids → dup-cluster
    machinery → size distribution) reproduces a serial string-keyed
    union-find's component sizes on the real built graph."""
    from collections import Counter

    import polars as pl

    from hikma_engine_ray.stages.components import dedup_clusters

    edges = built_graph["triples"].select_columns(["subj", "obj"])

    def to_pairs(t):
        def h(col):
            s = pl.Series(pl.from_arrow(t[col].combine_chunks()))
            return s.hash(seed=3).to_numpy().astype(np.uint64).view(np.int64)

        return pa.table({"a": pa.array(h("subj"), pa.int64()),
                         "b": pa.array(h("obj"), pa.int64())})

    comp = dedup_clusters(edges.map_batches(to_pairs, batch_format="pyarrow"))
    got = Counter(
        int(r["count()"]) + 1
        for r in comp.groupby("root").count().take_all()
    )

    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in edges.take_all():
        a, b = find(r["subj"]), find(r["obj"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    roots = Counter(find(x) for x in list(parent))
    want = Counter(v for v in roots.values())
    assert got == want


def test_pagerank_skewed_indegree(ray_session):
    """A hub every node points at (the stdlib-import shape) still sums
    to 1 and ranks the hub first."""
    import ray.data as rd

    from hikma_engine_ray.stages.pagerank import pagerank

    spokes = [f"n{i}" for i in range(50)]
    edges = [(s, "hub") for s in spokes] + [("hub", "n0")]
    t = pa.table({
        "src": pa.array([a for a, _ in edges], pa.string()),
        "dst": pa.array([b for _, b in edges], pa.string()),
    })
    got = _as_dict(pagerank(rd.from_arrow(t).repartition(8), iters=10))
    want = _dense_pagerank(edges, iters=10)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9), k
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # the hub and its sole successor hold nearly all the mass
    assert got["hub"] + got["n0"] > 0.7
    # at convergence (more iterations) the hub dominates
    got50 = _as_dict(pagerank(rd.from_arrow(t).repartition(8), iters=50))
    assert max(got50, key=got50.get) == "hub"


def _dense_ppr(edges, nodes, seeds, d=0.85, iters=10):
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    p = np.zeros(n)
    for s in seeds:
        p[idx[s]] = 1.0 / len(seeds)
    outdeg = np.zeros(n)
    for a, _b in edges:
        outdeg[idx[a]] += 1
    dangling = outdeg == 0
    safe = np.where(dangling, 1.0, outdeg)
    r = p.copy()
    for _ in range(iters):
        share = r / safe
        acc = np.zeros(n)
        for a, b in edges:
            acc[idx[b]] += share[idx[a]]
        r = (1 - d) * p + d * (acc + float(r[dangling].sum()) * p)
    return {v: r[i] for v, i in idx.items()}


@pytest.mark.parametrize("force_dist", [False, True])
def test_personalized_pagerank_matches_dense(ray_session, force_dist):
    import ray.data as rd

    from hikma_engine_ray.stages.pagerank import personalized_pagerank

    rng = np.random.default_rng(19)
    edges = [(f"n{a}", f"n{b}") for a, b in
             zip(rng.integers(0, 30, 120), rng.integers(0, 30, 120))]
    seeds = ["n1", "n2", "n999"]  # n999 isolated seed
    nodes = sorted({x for e in edges for x in e} | set(seeds))
    want = _dense_ppr(edges, nodes, seeds)
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"])) \
        .repartition(3)
    kw = {"driver_edge_bytes": 0} if force_dist else {}
    got = personalized_pagerank(ds, seeds, **kw).to_pandas()
    gm = dict(zip(got["node"], got["rank"]))
    assert set(gm) == set(want)
    for k in want:
        assert abs(gm[k] - want[k]) < 1e-9, k
    # mass concentrates near seeds; total mass == 1
    assert abs(sum(gm.values()) - 1.0) < 1e-9
    assert gm["n1"] > np.median(list(gm.values()))
