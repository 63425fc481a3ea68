"""Distributed multi-source BFS: exact shortest HOP distances from a
seed set, bounded by ``max_hops`` — the k-hop reachability / blast-
radius query a knowledge-graph user runs ("everything within 3 edges
of these entities"). The reference's graph-service adjacency queries
(graph-service.ts) answer single-node 1-hop lookups; this is the
scaled-out closure of that idea, and SQL-checkable (DuckDB recursive
CTE), unlike PageRank/components.

Iteration shapes, count-guarded like stages/pagerank.py:

  driver (indexed edge list fits ``driver_edge_bytes``): nodes are
      interned once into a dense index (hash-sorted searchsorted,
      vectorized); BFS is numpy mask propagation on the driver — a
      frontier-sized bincount per hop, zero distributed executions
      after the interning pass.

  broadcast (node count fits ``driver_limit``): per hop the frontier
      BIT MASK (n bytes) is ray.put once; each indexed edge block
      emits its per-block-distinct newly-reached dst indices — shuffle
      volume per hop is O(new frontier), never O(edges).

  join (beyond both guards): frontier and visited stay Datasets; per
      hop one bucketed hash join (edges ⋈ frontier on src) + one
      dedup + one left-anti join against visited (left join + null
      filter). The Pregel shape — no driver state beyond counters.

100 TB note: BFS shuffles only frontier-joined edges per hop; the
dedup bounds each hop's output by the node count. Hub nodes (a
supplier every part touches) are absorbed by per-block np.unique
pre-aggregation before the shuffle. Seeds are a driver-side list by
design (a query's seed set is human-sized); a dataset-sized seed set
is just hop 0 of the join path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .pagerank import _distinct_nodes, _hash_col

_DIST_SCHEMA = pa.schema([("node", pa.string()), ("dist", pa.int64())])


def _emit(nodes: list, dists: list) -> "pa.Table":
    return pa.Table.from_arrays(
        [pa.array(nodes, pa.string()),
         pa.array(np.asarray(dists, np.int64), pa.int64())],
        schema=_DIST_SCHEMA,
    )


def bfs_khop(edges, seeds: list[str], max_hops: int,
             src_col: str = "src", dst_col: str = "dst",
             driver_limit: int = 20_000_000, nbuckets: int = 32,
             driver_edge_bytes: int = 64 * 1024 * 1024):
    """Edge Dataset (src, dst — DIRECTED; pre-union the reverse edges
    for an undirected walk) + seed node ids → Dataset
    (node: string, dist: int64) with dist = exact shortest hop count
    <= max_hops. Every seed appears at dist 0 (even if isolated),
    matching the recursive-CTE semantics."""
    import ray
    import ray.data as rd

    seeds = sorted(set(seeds))
    if max_hops < 0 or not seeds:
        return rd.from_arrow(_emit([], []))

    nodes = _distinct_nodes(edges, src_col, dst_col).materialize()
    n = nodes.count()
    if n == 0 or max_hops == 0:
        return rd.from_arrow(_emit(seeds, [0] * len(seeds)))

    if n <= driver_limit:
        return _bfs_broadcast(edges, nodes, seeds, max_hops, src_col,
                              dst_col, n, driver_edge_bytes)
    return _bfs_join(edges, seeds, max_hops, src_col, dst_col, nbuckets)


def _bfs_broadcast(edges, nodes, seeds, max_hops, src_col, dst_col, n,
                   driver_edge_bytes):
    import ray
    import ray.data as rd

    node_list = nodes.to_pandas()["node"].to_list()
    h = _hash_col(node_list)
    order = np.argsort(h, kind="stable")
    h_sorted = h[order]
    href = ray.put(h_sorted)

    def index_edges(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hs = ray.get(href)
        s = np.searchsorted(hs, _hash_col(
            pc.cast(t[src_col], pa.string()).to_pylist()))
        d = np.searchsorted(hs, _hash_col(
            pc.cast(t[dst_col], pa.string()).to_pylist()))
        return pa.table({"si": pa.array(s.astype(np.int64), pa.int64()),
                         "di": pa.array(d.astype(np.int64), pa.int64())})

    indexed = edges.map_batches(index_edges,
                                batch_format="pyarrow").materialize()

    # dense-index positions of the seeds that exist in the graph
    seed_h = _hash_col(seeds)
    pos = np.searchsorted(h_sorted, seed_h)
    pos_ok = pos[(pos < n) & (h_sorted[np.minimum(pos, n - 1)] == seed_h)]

    dist = np.full(n, -1, dtype=np.int64)
    dist[pos_ok] = 0

    if indexed.count() * 16 <= driver_edge_bytes:
        ei = indexed.to_pandas()
        si = ei["si"].to_numpy().astype(np.int64, copy=False)
        di = ei["di"].to_numpy().astype(np.int64, copy=False)
        frontier = dist == 0
        for hop in range(1, max_hops + 1):
            hit = frontier[si]
            new = np.zeros(n, dtype=bool)
            new[di[hit]] = True
            new &= dist < 0
            if not new.any():
                break
            dist[new] = hop
            frontier = new
    else:
        frontier = dist == 0
        for hop in range(1, max_hops + 1):
            fref = ray.put(frontier)
            vref = ray.put(dist >= 0)

            def step(t: pa.Table, _f=fref, _v=vref) -> pa.Table:
                f, v = ray.get(_f), ray.get(_v)
                si = t["si"].to_numpy(zero_copy_only=False)
                di = t["di"].to_numpy(zero_copy_only=False)
                out = np.unique(di[f[si]])
                out = out[~v[out]]
                return pa.table({"i": pa.array(out, pa.int64())})

            rows = indexed.map_batches(step, batch_format="pyarrow").to_pandas()
            if not len(rows):
                break
            new_idx = np.unique(rows["i"].to_numpy())
            new_idx = new_idx[dist[new_idx] < 0]
            if not new_idx.size:
                break
            dist[new_idx] = hop
            frontier = np.zeros(n, dtype=bool)
            frontier[new_idx] = True

    inv_order = np.empty(n, dtype=np.int64)
    inv_order[order] = np.arange(n)
    dist_by_node = dist[inv_order]
    keep = dist_by_node >= 0
    names = np.asarray(node_list, dtype=object)[keep]
    dd = dist_by_node[keep]
    # seeds absent from the edge set still appear at dist 0
    missing = sorted(set(seeds) - set(names.tolist()))
    out = _emit(names.tolist() + missing, dd.tolist() + [0] * len(missing))
    import ray.data as rd

    return rd.from_arrow(out)


def _bfs_join(edges, seeds, max_hops, src_col, dst_col, nbuckets):
    """Fully distributed frontier iteration (Pregel shape)."""
    import ray.data as rd

    from .dedup import dedup_exact
    from .joins import bucketed_join

    def norm(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"node": pc.cast(t[src_col], pa.string()),
                         "dst": pc.cast(t[dst_col], pa.string())})

    e = edges.map_batches(norm, batch_format="pyarrow").materialize()

    visited = rd.from_arrow(_emit(seeds, [0] * len(seeds))).materialize()
    frontier = visited.map_batches(lambda t: t.select(["node"]),
                                   batch_format="pyarrow")
    for hop in range(1, max_hops + 1):
        nb = bucketed_join(e, frontier, on=["node"], nbuckets=nbuckets)

        def proj(t: pa.Table) -> pa.Table:
            return pa.table({"node": t["dst"]})

        nb = dedup_exact(nb.map_batches(proj, batch_format="pyarrow"),
                         key_cols=["node"], sort_cols=["node"])
        marked = bucketed_join(nb, visited, on=["node"], nbuckets=nbuckets,
                               how="left")

        def fresh(t: pa.Table, _h=hop) -> pa.Table:
            import pyarrow.compute as pc

            m = pc.is_null(t["dist"])
            kept = t.filter(m)
            return pa.table({
                "node": kept["node"],
                "dist": pa.array([_h] * kept.num_rows, pa.int64()),
            })

        new = marked.map_batches(fresh, batch_format="pyarrow").materialize()
        if new.count() == 0:
            break
        visited = visited.union(new).materialize()
        frontier = new.map_batches(lambda t: t.select(["node"]),
                                   batch_format="pyarrow")
    return visited
