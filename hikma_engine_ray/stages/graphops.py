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


# ------------------------------------------------------ triangle counting

def _canon_edges(edges, src_col: str, dst_col: str):
    """Undirected canonical form: (lo, hi) pairs, self-loops dropped,
    deduplicated. Integer endpoint columns stay int64 (np.unique /
    sorts on int64 are ~10x faster than on strings at the
    million-edge scale the driver path handles); everything else is
    canonicalized through Arrow's string cast. Either way (lo, hi) is
    a valid canonical pair — only the order CONVENTION differs, never
    the edge set, so counts are unchanged."""
    from .dedup import dedup_exact

    def canon(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        a, b = t[src_col], t[dst_col]
        if pa.types.is_integer(a.type) and pa.types.is_integer(b.type):
            a = pc.cast(a, pa.int64())
            b = pc.cast(b, pa.int64())
        else:
            a = pc.cast(a, pa.string())
            b = pc.cast(b, pa.string())
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        keep = pc.not_equal(lo, hi)
        t = pa.table({"lo": lo, "hi": hi}).filter(keep)
        return t.group_by(["lo", "hi"]).aggregate([])  # in-block dedup

    parts = edges.map_batches(canon,
                              batch_format="pyarrow").materialize()
    # count-guarded driver distinct (hash-based drop_duplicates) —
    # per-block-distinct partials are edge-cardinality-sized; the
    # bucketed dedup below is the 100 TB shape
    if parts.count() <= 4_000_000:
        import pandas as pd
        import ray.data as rd

        from .dedup import collect_arrow

        df = collect_arrow(parts).to_pandas().drop_duplicates(
            ["lo", "hi"])
        return rd.from_arrow(pa.Table.from_pandas(
            df, preserve_index=False))

    return dedup_exact(parts, key_cols=["lo", "hi"],
                       sort_cols=["lo", "hi"])


def triangle_count(edges, src_col: str = "src", dst_col: str = "dst",
                   driver_edge_bytes: int = 128 * 1024 * 1024,
                   nbuckets: int = 32):
    """Exact triangle count of the undirected graph given as an edge
    dataset (any orientation, duplicates/self-loops tolerated).
    Returns Dataset with ONE row (n_edges: int64, n_triangles: int64).

    Algorithm (public; the classic degree-ordered wedge check — e.g.
    Schank & Wagner 2005, and the MapReduce form in Suri & Vassilvitskii
    2011 "Counting Triangles and the Curse of the Last Reducer"):
    orient each edge from the lower-ranked endpoint under a total
    order; generate wedges (v, w) from each node's forward adjacency;
    a triangle exists iff the wedge closes an oriented edge. Each
    triangle is counted exactly once for ANY total order; ordering by
    DEGREE bounds wedge volume by O(m^1.5) (used on the driver path,
    where degrees are free). The distributed path orients by node id —
    wedge volume then depends on hub out-degree; pre-cap hub degrees
    upstream or accept the documented skew (Suri's curse).

    Count-guarded: canonical edge list under ``driver_edge_bytes`` →
    vectorized numpy (intern, orient by (deg, id), per-node triu wedge
    expansion, searchsorted membership). Past the guard: distributed
    wedges via one bucketed groupby(lo) + one bucketed join against
    the edge set. Equivalence-gated in tests/test_graphops.py."""
    e = _canon_edges(edges, src_col, dst_col).materialize()
    m = e.count()
    if m == 0:
        out = pa.table({"n_edges": pa.array([0], pa.int64()),
                        "n_triangles": pa.array([0], pa.int64())})
        import ray.data as rd

        return rd.from_arrow(out)
    if m * 32 <= driver_edge_bytes:
        tri = _triangles_driver(e)
    else:
        tri = _triangles_joined(e, nbuckets)
    out = pa.table({"n_edges": pa.array([m], pa.int64()),
                    "n_triangles": pa.array([tri], pa.int64())})
    import ray.data as rd

    return rd.from_arrow(out)


def _pack(v: np.ndarray, w: np.ndarray) -> np.ndarray:
    return (v.astype(np.int64) << np.int64(32)) | w.astype(np.int64)


def _triangles_driver(e) -> int:
    df = e.to_pandas()
    names, inv = np.unique(
        np.concatenate([df["lo"].to_numpy(), df["hi"].to_numpy()]),
        return_inverse=True)
    n = len(names)
    a = inv[: len(df)].astype(np.int64)
    b = inv[len(df):].astype(np.int64)
    deg = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
    # rank = (deg, id) lexicographic — hub nodes get few forward edges
    rank = np.argsort(np.lexsort((np.arange(n), deg)), kind="stable")
    fwd = rank[a] < rank[b]
    u = np.where(fwd, a, b)
    v = np.where(fwd, b, a)
    # adjacency sorted by RANK within each u-run: wedge pairs (ia<ib)
    # then come out already rank-oriented, so the closure key needs no
    # rank gathers / np.where — half the memory traffic of the naive
    # form at tens of millions of wedges
    order = np.lexsort((rank[v], u))
    u, v = u[order], v[order]
    eset = np.sort(_pack(u, v))
    # per-node forward adjacency slices
    starts = np.searchsorted(u, np.arange(n), side="left")
    ends = np.searchsorted(u, np.arange(n), side="right")
    k_all = ends - starts
    total = 0
    # degree-class vectorization: all nodes of forward degree k share
    # one triu template, so the wedge expansion is a single 2-D gather
    # per class (chunked to bound peak memory) instead of a Python
    # loop over every node
    _CHUNK = 8_000_000  # max wedge cells materialized at once
    for k in np.unique(k_all):
        if k < 2:
            continue
        nodes = np.nonzero(k_all == k)[0]
        ia, ib = np.triu_indices(int(k), k=1)
        w = len(ia)
        step = max(1, _CHUNK // w)
        for c0 in range(0, len(nodes), step):
            ch = nodes[c0:c0 + step]
            base = starts[ch][:, None]
            wa = v[base + ia[None, :]]
            wb = v[base + ib[None, :]]
            keys = _pack(wa, wb).ravel()  # already rank-oriented
            pos = np.searchsorted(eset, keys)
            pos[pos >= len(eset)] = len(eset) - 1
            total += int((eset[pos] == keys).sum())
    return total


def _triangles_joined(e, nbuckets: int) -> int:
    """Distributed wedge-join path: wedges from per-lo forward
    adjacency (id order), inner-joined against the edge set."""
    import pandas as pd

    from .dedup import BUCKET_COL, add_bucket_column, blocks_for_keys
    from .joins import bucketed_join

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        outs_a, outs_b = [], []
        for _, sub in g.groupby("lo", sort=False):
            nb = np.sort(sub["hi"].to_numpy(dtype=object))
            if len(nb) < 2:
                continue
            ia, ib = np.triu_indices(len(nb), k=1)
            outs_a.append(nb[ia])
            outs_b.append(nb[ib])
        a = np.concatenate(outs_a) if outs_a else np.empty(0, object)
        b = np.concatenate(outs_b) if outs_b else np.empty(0, object)
        return pd.DataFrame({"lo": pd.Series(a, dtype=object),
                             "hi": pd.Series(b, dtype=object)})

    w = (
        e.map_batches(add_bucket_column(["lo"], nbuckets),
                      batch_format="pyarrow")
        .repartition(blocks_for_keys(nbuckets))
        .groupby(BUCKET_COL)
        .map_groups(lambda g: wedges(g.drop(columns=[BUCKET_COL])),
                    batch_format="pandas")
    )

    def mark(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__is_edge", pa.array(np.ones(t.num_rows, np.int8), pa.int8()))

    ej = e.map_batches(mark, batch_format="pyarrow")
    joined = bucketed_join(w, ej, on=["lo", "hi"], nbuckets=nbuckets,
                           how="inner")
    return joined.count()


# ------------------------------------------------- label propagation

def label_propagation(edges, iters: int = 10, src_col: str = "src",
                      dst_col: str = "dst",
                      driver_limit: int = 20_000_000,
                      driver_edge_bytes: int = 128 * 1024 * 1024,
                      nbuckets: int = 32):
    """Community detection by SYNCHRONOUS label propagation (public
    algorithm: Raghavan, Albert, Kumara 2007), made deterministic:
    every node starts as its own label; each round every node adopts
    the most frequent label among its neighbors (undirected — the
    reverse edge is added internally), ties broken by the SMALLEST
    label, isolated nodes keep their own. Fixed ``iters`` synchronous
    rounds → layout-independent, reproducible output (asynchronous LPA
    is order-dependent; the synchronous form can oscillate on bipartite
    structures, which a fixed round count simply truncates).

    Returns Dataset (node: string, community: string) where the
    community id is the member node's final label rendered as the node
    name it started from.

    Count-guarded shapes like bfs_khop: driver numpy under the edge
    byte budget; past it, per-round per-block (node,label) count
    partials → one groupby — shuffle volume is distinct (node, label)
    pairs per block, never edges — with the n-sized label vector
    ray.put each round (node count under ``driver_limit``, the same
    standing guard as pagerank's broadcast path)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    nodes = _distinct_nodes(edges, src_col, dst_col).materialize()
    node_list = nodes.to_pandas()["node"].to_list()
    n = len(node_list)
    if n == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.string()),
                                       "community": pa.array([], pa.string())}))
    if n > driver_limit:
        raise ValueError(
            f"node count {n} exceeds driver_limit ({driver_limit}); the "
            "fully-distributed label table variant is deliberately "
            "omitted until a caller needs it — see pagerank join path "
            "for the shape it would take")
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
        # undirected: both directions; per-block dedup (simple-graph
        # semantics — parallel edges don't multiply label votes)
        si = np.concatenate([s, d]).astype(np.int64)
        di = np.concatenate([d, s]).astype(np.int64)
        uniq = np.unique(si * np.int64(len(hs)) + di)
        return pa.table({
            "si": pa.array(uniq // len(hs), pa.int64()),
            "di": pa.array(uniq % len(hs), pa.int64()),
        })

    from .dedup import dedup_exact

    indexed = dedup_exact(
        edges.map_batches(index_edges, batch_format="pyarrow"),
        key_cols=["si", "di"], sort_cols=["si", "di"],
    ).materialize()

    # label of dense index i = the node's ORIGINAL-ORDER position so
    # "smallest label" is the lexicographically-smallest node name
    inv_order = np.empty(n, dtype=np.int64)
    inv_order[order] = np.arange(n)
    name_rank = np.argsort(np.asarray(node_list, dtype=object),
                           kind="stable")
    rank_of = np.empty(n, dtype=np.int64)
    rank_of[name_rank] = np.arange(n)  # original pos -> lexicographic rank
    lab = rank_of[order]  # dense idx i holds node_list[order[i]]'s rank

    def argmax_update(vi, li, cnt, lab):
        """new label per node = max count, tie min label (vectorized:
        sort by (v, -count, label), take first per v)."""
        o = np.lexsort((li, -cnt, vi))
        vi, li = vi[o], li[o]
        first = np.ones(len(vi), dtype=bool)
        first[1:] = vi[1:] != vi[:-1]
        new = lab.copy()
        new[vi[first]] = li[first]
        return new

    if indexed.count() * 16 <= driver_edge_bytes:
        ei = indexed.to_pandas()
        si = ei["si"].to_numpy().astype(np.int64, copy=False)
        di = ei["di"].to_numpy().astype(np.int64, copy=False)
        for _ in range(iters):
            key = di * np.int64(n) + lab[si]
            uk, cnt = np.unique(key, return_counts=True)
            lab = argmax_update(uk // n, uk % n, cnt, lab)
    else:
        for _ in range(iters):
            lref = ray.put(lab)

            def cpart(t: pa.Table, _l=lref) -> pa.Table:
                ll = ray.get(_l)
                si = t["si"].to_numpy(zero_copy_only=False)
                di = t["di"].to_numpy(zero_copy_only=False)
                key = di * np.int64(n) + ll[si]
                uk, cnt = np.unique(key, return_counts=True)
                return pa.table({"k": pa.array(uk, pa.int64()),
                                 "c": pa.array(cnt.astype(np.int64),
                                               pa.int64())})

            rows = (indexed.map_batches(cpart, batch_format="pyarrow")
                    .groupby("k").aggregate(Sum("c", alias_name="c"))
                    .to_pandas())
            if not len(rows):
                break
            uk = rows["k"].to_numpy().astype(np.int64)
            cnt = rows["c"].to_numpy().astype(np.int64)
            lab = argmax_update(uk // n, uk % n, cnt, lab)

    # render: community = node name at the label's lexicographic rank
    names_sorted = np.asarray(node_list, dtype=object)[name_rank]
    comm = names_sorted[lab[inv_order]]
    return rd.from_arrow(pa.table({
        "node": pa.array(node_list, pa.string()),
        "community": pa.array(comm, pa.string()),
    }))


# ------------------------------------------------------------- SSSP

def sssp(edges, sources: list[str], max_hops: int,
         src_col: str = "src", dst_col: str = "dst", w_col: str = "w",
         driver_edge_bytes: int = 128 * 1024 * 1024, nbuckets: int = 32):
    """Weighted single/multi-source shortest WALKS of <= ``max_hops``
    edges (synchronous Bellman-Ford). Edge Dataset (src, dst, w —
    DIRECTED; pre-union the reverse rows for an undirected walk) →
    Dataset (node: string, dist: float64); every source appears at
    dist 0.0.

    EXACT float parity with a bounded recursive-CTE oracle: the
    relaxation ``min(dist_prev) + w`` equals the min over per-walk
    left-to-right running sums because float addition of a shared
    addend is monotone — min-then-add == add-then-min, bit for bit.
    Iterations are SYNCHRONOUS (Jacobi: each round reads the previous
    round's table) so round k covers exactly walks of <= k edges, the
    CTE's ``hops < k`` semantics — an in-place (Gauss-Seidel) update
    would race ahead of the hop bound.

    Count-guarded like the BFS: interned-edge numpy iterations on the
    driver under ``driver_edge_bytes`` (np.minimum.at over a dist
    snapshot per round); past the guard, ``max_hops`` bucketed
    join+min rounds — per-round shuffle volume is the frontier-sized
    dist table plus one (dist ⋈ edges) join, never all walks.
    Equivalence-gated in tests/test_graphops.py."""
    import ray
    import ray.data as rd

    sources = sorted(set(sources))
    if max_hops < 0 or not sources:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "dist": pa.array([], pa.float64())}))

    def canon(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "u": pc.cast(t[src_col], pa.string()),
            "v": pc.cast(t[dst_col], pa.string()),
            "w": pc.cast(t[w_col], pa.float64()),
        })

    e = edges.map_batches(canon, batch_format="pyarrow").materialize()
    m = e.count()
    if m * 24 <= driver_edge_bytes:
        return _sssp_driver(e, sources, max_hops)
    return _sssp_join(e, sources, max_hops, nbuckets)


def _sssp_driver(e, sources, max_hops) -> "ray.data.Dataset":
    import ray.data as rd

    import pandas as pd

    df = e.to_pandas()
    # hash-based interning: pd.factorize is ~20x np.unique on string
    # node labels at the million-edge scale (no sort needed — the
    # dense index order is irrelevant to the relaxation)
    inv, names = pd.factorize(
        np.concatenate([df["u"].to_numpy(), df["v"].to_numpy(),
                        np.asarray(sources, dtype=object)]))
    names = np.asarray(names, dtype=object)
    n = len(names)
    su = inv[: len(df)].astype(np.int64)
    sv = inv[len(df): 2 * len(df)].astype(np.int64)
    si = inv[2 * len(df):].astype(np.int64)
    w = df["w"].to_numpy(dtype=np.float64)
    dist = np.full(n, np.inf)
    dist[si] = 0.0
    for _ in range(max_hops):
        prev = dist.copy()          # synchronous round
        cand = prev[su] + w
        np.minimum.at(dist, sv, cand)
    keep = np.isfinite(dist)
    return rd.from_arrow(pa.table({
        "node": pa.array(names[keep], pa.string()),
        "dist": pa.array(dist[keep], pa.float64()),
    }))


def _sssp_join(e, sources, max_hops, nbuckets) -> "ray.data.Dataset":
    import ray.data as rd
    from ray.data.aggregate import Min

    from .joins import bucketed_join

    dist = rd.from_arrow(pa.table({
        "node": pa.array(sources, pa.string()),
        "dist": pa.array([0.0] * len(sources), pa.float64()),
    }))
    for _ in range(max_hops):
        fr = dist.map_batches(
            lambda t: t.rename_columns(["u", "du"]),
            batch_format="pyarrow")
        relaxed = bucketed_join(fr, e, on=["u"], nbuckets=nbuckets)
        new = relaxed.map_batches(
            lambda t: pa.table({
                "node": t["v"],
                "dist": pa.array(
                    t["du"].to_numpy(zero_copy_only=False)
                    + t["w"].to_numpy(zero_copy_only=False),
                    pa.float64()),
            }),
            batch_format="pyarrow")
        dist = (
            dist.union(new)
            .groupby("node")
            .aggregate(Min("dist", alias_name="dist"))
            .materialize()          # synchronous round boundary
        )
    return dist
