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
