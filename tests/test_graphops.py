"""bfs_khop: the three iteration shapes (driver numpy, per-hop
broadcast mask, Pregel join) must agree with each other and with a
serial BFS reference, across block layouts, seed edge cases, and
isolated seeds."""

from collections import deque

import numpy as np
import pandas as pd
import pytest

from hikma_engine_ray.stages.graphops import bfs_khop


def _serial_bfs(edges, seeds, max_hops):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    dist = {s: 0 for s in set(seeds)}
    q = deque(dist)
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _rand_graph(n_nodes, n_edges, seed):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    return [(f"n{a}", f"n{b}") for a, b in zip(src, dst)]


def _run(edges, seeds, max_hops, nblocks=3, **kw):
    import ray.data as rd

    df = pd.DataFrame(edges, columns=["src", "dst"])
    ds = rd.from_pandas(df).repartition(nblocks)
    out = bfs_khop(ds, seeds, max_hops, **kw).to_pandas()
    return dict(zip(out["node"], out["dist"]))


@pytest.mark.parametrize("hops", [0, 1, 3])
def test_three_paths_agree_with_serial(ray_session, hops):
    edges = _rand_graph(60, 150, seed=5)
    seeds = ["n0", "n7", "n999"]  # n999 isolated — still dist 0
    want = _serial_bfs(edges, seeds, hops)
    driver = _run(edges, seeds, hops)
    bcast = _run(edges, seeds, hops, driver_edge_bytes=0)
    join = _run(edges, seeds, hops, driver_limit=0, nbuckets=4)
    assert driver == want
    assert bcast == want
    assert join == want


def test_layout_invariance(ray_session):
    edges = _rand_graph(40, 90, seed=9)
    seeds = ["n1"]
    a = _run(edges, seeds, 2, nblocks=1)
    b = _run(edges, seeds, 2, nblocks=6)
    assert a == b == _serial_bfs(edges, seeds, 2)


def test_empty_edges_and_seeds(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"src": [], "dst": []}).astype(str))
    out = bfs_khop(ds, ["a", "b"], 3).to_pandas()
    assert dict(zip(out["node"], out["dist"])) == {"a": 0, "b": 0}
    out2 = bfs_khop(ds, [], 3).to_pandas()
    assert len(out2) == 0


def _brute_triangles(edges):
    es = set()
    for a, b in edges:
        if a != b:
            es.add((min(a, b), max(a, b)))
    nodes = sorted({x for e in es for x in e})
    import itertools

    cnt = 0
    for a, b, c in itertools.combinations(nodes, 3):
        if ((a, b) in es and (b, c) in es and (a, c) in es):
            cnt += 1
    return len(es), cnt


@pytest.mark.parametrize("seed", [1, 2])
def test_triangle_paths_agree_with_brute(ray_session, seed):
    import ray.data as rd

    from hikma_engine_ray.stages.graphops import triangle_count

    edges = _rand_graph(25, 140, seed=seed)
    m_want, t_want = _brute_triangles(edges)
    df = pd.DataFrame(edges, columns=["src", "dst"])
    ds = rd.from_pandas(df).repartition(3)
    drv = triangle_count(ds).to_pandas()
    dist = triangle_count(ds, driver_edge_bytes=0, nbuckets=4).to_pandas()
    assert (drv["n_edges"][0], drv["n_triangles"][0]) == (m_want, t_want)
    assert (dist["n_edges"][0], dist["n_triangles"][0]) == (m_want, t_want)
    assert t_want > 0


def test_triangle_empty_and_selfloops(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.graphops import triangle_count

    df = pd.DataFrame({"src": ["a", "b"], "dst": ["a", "b"]})
    out = triangle_count(rd.from_pandas(df)).to_pandas()
    assert out["n_edges"][0] == 0 and out["n_triangles"][0] == 0


def _serial_lpa(edges, iters):
    und = set()
    nodes = set()
    for a, b in edges:
        nodes.update((a, b))
        und.add((a, b))
        und.add((b, a))
    adj = {}
    for a, b in und:
        adj.setdefault(b, []).append(a)  # neighbors contributing to b
    lab = {v: v for v in nodes}
    for _ in range(iters):
        new = {}
        for v in nodes:
            nbrs = adj.get(v, [])
            if not nbrs:
                new[v] = lab[v]
                continue
            counts = {}
            for u in nbrs:
                counts[lab[u]] = counts.get(lab[u], 0) + 1
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            new[v] = best[0]
        lab = new
    return lab


@pytest.mark.parametrize("force_dist", [False, True])
def test_label_propagation_matches_serial(ray_session, force_dist):
    import ray.data as rd

    from hikma_engine_ray.stages.graphops import label_propagation

    rng = np.random.default_rng(29)
    # two dense blobs + a bridge: clear community structure
    edges = []
    for base in (0, 40):
        for _ in range(150):
            a, b = rng.integers(base, base + 20, 2)
            edges.append((f"n{a:03d}", f"n{b:03d}"))
    edges.append(("n000", "n040"))
    want = _serial_lpa(edges, 10)
    df = pd.DataFrame(edges, columns=["src", "dst"])
    kw = {"driver_edge_bytes": 0} if force_dist else {}
    got = label_propagation(
        rd.from_pandas(df).repartition(3), iters=10, nbuckets=4, **kw
    ).to_pandas()
    gm = dict(zip(got["node"], got["community"]))
    assert gm == want
    # community structure found: the two blobs end in different labels
    assert len(set(gm.values())) >= 2


def test_label_propagation_layout_invariant(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.graphops import label_propagation

    edges = _rand_graph(30, 80, seed=4)
    df = pd.DataFrame(edges, columns=["src", "dst"])
    a = label_propagation(rd.from_pandas(df).repartition(1)).to_pandas()
    b = label_propagation(rd.from_pandas(df).repartition(7)).to_pandas()
    assert dict(zip(a["node"], a["community"])) == \
        dict(zip(b["node"], b["community"]))


def test_sssp_hand_checked_and_paths(ray_session):
    """4-node weighted graph: hop-bounded min walk sums, driver ≡ join
    path, source at dist 0, unreachable nodes absent."""
    import pandas as pd
    import ray.data as rd

    from hikma_engine_ray.stages.graphops import sssp

    # a->b(1), a->c(10), b->c(2), c->d(1); e isolated via f->e only
    e = pd.DataFrame({
        "src": ["a", "a", "b", "c", "f"],
        "dst": ["b", "c", "c", "d", "e"],
        "w": [1.0, 10.0, 2.0, 1.0, 5.0],
    })
    ds = rd.from_pandas(e).repartition(2)

    def run(**kw):
        return (sssp(ds, ["a"], 3, **kw).to_pandas()
                .sort_values("node").reset_index(drop=True))

    got = run()
    assert dict(zip(got["node"], got["dist"])) == {
        "a": 0.0, "b": 1.0, "c": 3.0, "d": 4.0}  # a-b-c-d within 3 hops
    # hop bound: with 2 hops d is reachable only via a-c-d = 11
    got2 = sssp(ds, ["a"], 2).to_pandas()
    assert dict(zip(got2["node"], got2["dist"]))["d"] == 11.0
    # join path equivalence
    slow = run(driver_edge_bytes=0)
    pd.testing.assert_frame_equal(got, slow)
