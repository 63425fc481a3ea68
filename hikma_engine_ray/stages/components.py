"""Connected components over near-duplicate pair edges → dup clusters.

The dedup suite (stages/dedup_suite.py) ends at verified PAIRS; a real
training-data pipeline needs the next step: group pairs into clusters
and keep one canonical doc per cluster. Two implementations:

  union_find_components   driver-side union-find. The right tool when
                          the edge list is RESULT-SIZED (verified
                          near-dup pairs usually are); O(E α(E)).
  connected_components    distributed alternating large-star /
                          small-star contraction (Kiveris et al.,
                          "Connected Components in MapReduce and
                          Beyond", SoCC'14 — public algorithm). Only
                          shuffles edges keyed by endpoint, never
                          joins against a label table; converges in
                          O(log² n) rounds (2-3 rounds for the tiny
                          diameters of dup clusters). The scale path
                          when pairs outgrow the driver.

Both return (node, root) with root = min node id of the component —
deterministic, so either implementation can back ``dedup_clusters``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

PAIR_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])
COMP_SCHEMA = pa.schema([("node", pa.int64()), ("root", pa.int64())])


def union_find_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find with path compression; root = min member."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id keeps roots deterministic
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
        parent.setdefault(a, find(a))
        parent.setdefault(b, find(b))
    return {x: find(x) for x in parent}


def _star(g: pd.DataFrame, large: bool) -> pd.DataFrame:
    """One star operation for the groups of one shuffle bucket.
    Input rows (u, v) are edges grouped by u (both directions present
    for large-star). Emits the contracted edges."""
    out_a, out_b = [], []
    for u, sub in g.groupby("u", sort=False):
        nbrs = sub["v"].to_numpy()
        if large:
            m = min(int(nbrs.min()), int(u))
            for v in nbrs[nbrs > u]:
                if int(v) != m:
                    out_a.append(int(v))
                    out_b.append(m)
        else:
            small = nbrs[nbrs <= u]
            m = min(int(small.min()) if len(small) else int(u), int(u))
            for v in small:
                if int(v) != m:
                    out_a.append(int(v))
                    out_b.append(m)
            if int(u) != m:
                out_a.append(int(u))
                out_b.append(m)
    df = pd.DataFrame({"a": pd.Series(out_a, dtype="int64"),
                       "b": pd.Series(out_b, dtype="int64")})
    return df.drop_duplicates()


def _edge_stats(ds) -> tuple[int, int]:
    """(count, checksum) convergence fingerprint — one aggregate pass."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def mix(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = a * np.uint64(0x9E3779B97F4A7C15) ^ b * np.uint64(
                0xBF58476D1CE4E5B9
            )
        return pa.table({"h": pa.array(
            (h % np.uint64(2**62)).astype(np.int64), pa.int64()
        )})

    row = ds.map_batches(mix, batch_format="pyarrow").aggregate(
        Count(alias_name="n"), Sum("h", alias_name="s")
    )
    del pc
    return int(row["n"] or 0), int(row["s"] or 0)


def connected_components(pairs_ds, max_iters: int = 16):
    """Distributed components: alternate large-star / small-star until
    the edge set is a fixed point, then edges ARE (node → root).
    Returns a Dataset with COMP_SCHEMA (every non-root node rows once;
    roots are implied members). Input: Dataset of (a, b) int64 pairs."""

    def dedup_dirless(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        a, b = t["a"], t["b"]
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        t = pa.table({"a": lo, "b": hi}).filter(pc.invert(pc.equal(lo, hi)))
        return t

    def expand_both(t: pa.Table) -> pa.Table:
        return pa.table({
            "u": pa.concat_arrays([t["a"].combine_chunks(), t["b"].combine_chunks()]),
            "v": pa.concat_arrays([t["b"].combine_chunks(), t["a"].combine_chunks()]),
        })

    def expand_large_only(t: pa.Table) -> pa.Table:
        # small-star groups by u over edges (v ≤ u): orient high → low
        import pyarrow.compute as pc

        lo = pc.min_element_wise(t["a"], t["b"])
        hi = pc.max_element_wise(t["a"], t["b"])
        return pa.table({"u": hi, "v": lo})

    edges = pairs_ds.map_batches(dedup_dirless, batch_format="pyarrow")
    prev = None
    for _ in range(max_iters):
        # large-star
        edges = (
            edges.map_batches(expand_both, batch_format="pyarrow")
            .groupby("u")
            .map_groups(lambda g: _star(g, large=True), batch_format="pandas")
            .map_batches(dedup_dirless, batch_format="pyarrow")
        )
        # small-star
        edges = (
            edges.map_batches(expand_large_only, batch_format="pyarrow")
            .groupby("u")
            .map_groups(lambda g: _star(g, large=False), batch_format="pandas")
            .map_batches(dedup_dirless, batch_format="pyarrow")
        ).materialize()
        cur = _edge_stats(edges)
        if cur == prev:
            break
        prev = cur

    def to_comp(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # after convergence every edge is (node, root), node > root
        return pa.table({
            "node": pc.max_element_wise(t["a"], t["b"]),
            "root": pc.min_element_wise(t["a"], t["b"]),
        }).cast(COMP_SCHEMA)

    return edges.map_batches(to_comp, batch_format="pyarrow")


def dedup_clusters(pairs_ds, *, distributed: bool | None = None,
                   driver_limit: int = 2_000_000):
    """Verified near-dup pairs → (node, root) cluster table. Uses the
    driver union-find while the pair list is result-sized (≤
    ``driver_limit``), else the distributed star contraction — same
    deterministic output either way (root = min member id)."""
    if distributed is None:
        distributed = pairs_ds.count() > driver_limit
    if distributed:
        return connected_components(pairs_ds)
    import ray.data as rd

    rows = pairs_ds.take_all()
    comp = union_find_components([(int(r["a"]), int(r["b"])) for r in rows])
    t = pa.Table.from_pydict(
        {
            "node": [n for n, r in sorted(comp.items()) if n != r],
            "root": [r for n, r in sorted(comp.items()) if n != r],
        },
        schema=COMP_SCHEMA,
    )
    return rd.from_arrow(t)
