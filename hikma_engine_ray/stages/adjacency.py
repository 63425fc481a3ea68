"""Adjacency-list materialization (SURVEY.md §2.5 A1, §1.4).

Replaces the reference's driver-memory whole-graph maps
(in-memory-graph.ts:33-141) with a distributed build:

  1. double-emit each triple — (node=subj, dir=out) and (node=obj,
     dir=in) — vectorized in Arrow;
  2. **partial aggregation per block**: group (bucket, node, seg, dir)
     with Arrow's hash_list so the shuffle moves one compressed
     list-row per node per block instead of one row per edge (triples
     are emitted per-file, so a node's edges are nearly block-local →
     ~3-10× fewer shuffled rows);
  3. one bucketed shuffle; per bucket: flatten partials (vectorized
     list_flatten / list_parent_indices), sort, and assemble the final
     ``out``/``in`` struct lists from offsets.

Degree bound (the 10^12-file hazard): a pathological high-degree node —
a Repository containing millions of files, a stdlib module imported
everywhere — would otherwise concentrate its whole edge list in ONE
group block and one giant list cell. Nodes whose estimated degree
exceeds ``degree_cap`` (heavy-hitter estimate from a prefix sample,
same pattern as linking.find_hot_keys_sampled) are SEGMENTED: each of
their edges is deterministically assigned ``seg = hash(other) % nseg``
and the shuffle key mixes the segment, so the node materializes as
``nseg`` bounded rows ``(node_id, seg, out, in)``. Normal nodes keep a
single ``seg = 0`` row — their output is unchanged. Consumers that need
total degree sum over segments (see graph_query.degree_stats).

Output schema: ``node_id, seg, out: list<struct<pred,obj>>,
in: list<struct<pred,subj>>``.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

ADJ_SCHEMA = pa.schema(
    [
        ("node_id", pa.string()),
        ("seg", pa.int32()),
        ("out", pa.list_(pa.struct([("pred", pa.string()), ("obj", pa.string())]))),
        ("in", pa.list_(pa.struct([("pred", pa.string()), ("subj", pa.string())]))),
    ]
)

_SEG_MIX = np.uint64(0x9E3779B1)  # golden-ratio odd constant for key mixing


def find_hot_degree_nodes(triples_ds, degree_cap: int,
                          sample_rows: int = 100_000) -> dict[str, int]:
    """Heavy-hitter degree estimate from a prefix sample — no extra
    shuffle. Returns {node_id: nseg} for nodes whose extrapolated
    degree (in + out) exceeds the cap. A missed borderline node only
    costs one oversized block, never correctness."""
    total = triples_ds.count()
    if total == 0:
        return {}
    sample = triples_ds.limit(min(sample_rows, total)).take_all()
    scale = max(1.0, total / len(sample))
    counts: dict[str, int] = {}
    for r in sample:
        counts[r["subj"]] = counts.get(r["subj"], 0) + 1
        counts[r["obj"]] = counts.get(r["obj"], 0) + 1
    hot: dict[str, int] = {}
    for node, n in counts.items():
        est = n * scale
        if est > degree_cap:
            hot[node] = segments_for(est, degree_cap)
    return hot


def segments_for(est_degree: float, degree_cap: int) -> int:
    """Segment count for one hot node: 1.5× headroom over the degree
    estimate, bounded to [2, 256]."""
    return int(min(256, max(2, math.ceil(est_degree * 1.5 / degree_cap))))


def _emit_partials(nbuckets: int, hot: dict[str, int] | None = None):
    hot = hot or {}

    def fn(batch: pa.Table) -> pa.Table:
        import polars as pl

        subj = batch["subj"].combine_chunks()
        pred = batch["pred"].combine_chunks()
        obj = batch["obj"].combine_chunks()
        n = batch.num_rows
        node = pa.chunked_array([subj, obj]).combine_chunks()
        other = pa.chunked_array([obj, subj]).combine_chunks()
        direction = pa.chunked_array(
            [pa.nulls(n, pa.string()).fill_null("o"),
             pa.nulls(n, pa.string()).fill_null("i")]
        ).combine_chunks()
        # polars xxhash: stable for fixed seed+version; a shuffle key only
        # needs intra-job consistency (never Python hash())
        h = pl.Series(pl.from_arrow(node)).hash(seed=0).to_numpy()
        seg = np.zeros(2 * n, dtype=np.int64)
        if hot:
            node_np = np.asarray(node.to_pylist(), dtype=object)
            hot_any = np.isin(node_np, list(hot.keys()))
            if hot_any.any():
                oh = pl.Series(pl.from_arrow(other)).hash(seed=1).to_numpy()
                for hn, nseg in hot.items():
                    mask = node_np == hn
                    seg[mask] = (oh[mask] % np.uint64(nseg)).astype(np.int64)
        buckets = ((h + seg.astype(np.uint64) * _SEG_MIX) % np.uint64(nbuckets)).astype(np.int32)
        t = pa.table(
            {
                "node_id": node,
                "seg": pa.array(seg.astype(np.int32), pa.int32()),
                "dir": direction,
                "pred": pa.chunked_array([pred, pred]).combine_chunks(),
                "other": other,
                "__bucket": pa.array(buckets, pa.int32()),
            }
        )
        # combiner: one list-row per (bucket, node, seg, dir) per block
        g = t.group_by(["__bucket", "node_id", "seg", "dir"]).aggregate(
            [("pred", "list"), ("other", "list")]
        )
        return g.rename_columns(
            ["__bucket", "node_id", "seg", "dir", "pred_list", "other_list"]
        )

    return fn


def _assemble(g: pa.Table) -> pa.Table:
    """Per bucket: flatten partial lists back to edge rows (vectorized),
    sort, and build the final out/in struct lists from offsets. Rows
    are keyed by (node_id, seg) — seg is 0 for every normal node.

    All heavy kernels (dedup, multi-column sort, group boundaries) run
    in polars over the Arrow buffers; the pandas object-dtype version
    with string composite keys cost ~500 CPU-seconds on the 800k-file
    scaling corpus and its straggler bucket bounded the phase wall."""
    import polars as pl

    parent = pc.list_parent_indices(g["pred_list"])
    flat = pa.table(
        {
            "node_id": pc.take(g["node_id"], parent),
            "seg": pc.take(g["seg"], parent),
            "dir": pc.take(g["dir"], parent),
            "pred": pc.list_flatten(g["pred_list"]),
            "other": pc.list_flatten(g["other_list"]),
        }
    )
    # exact dedup at the reduce: duplicates of a triple land in the same
    # (node, dir) group by construction, so dropping them here makes the
    # adjacency correct even over a PRE-dedup triple stream (streaming
    # mode skips the global dedup shuffle); a no-op for deduped input.
    # Sort order (node_id, seg, pred, other) matches the prior string
    # composite key (seg was zero-padded, i.e. numeric order).
    df = (
        pl.from_arrow(flat)
        .unique(subset=["node_id", "seg", "dir", "pred", "other"])
        .sort(["node_id", "seg", "pred", "other"])
    )
    if df.height == 0:
        return ADJ_SCHEMA.empty_table()
    # run-length key ids over the sorted (node_id, seg) pairs: kid is
    # 0-based dense rank in sorted order — exactly the row index of the
    # output table
    def _arr(s: "pl.Series", typ: pa.DataType) -> pa.Array:
        a = s.to_arrow()
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        return a.cast(typ)

    nid = df["node_id"]
    seg = df["seg"]
    newkey = ((nid != nid.shift(1)) | (seg != seg.shift(1))).fill_null(True)
    kid = (newkey.cum_sum() - 1).to_numpy()
    first = np.flatnonzero(newkey.to_numpy())
    nkeys = len(first)
    node_ids = _arr(nid, pa.string()).take(pa.array(first))
    segs = _arr(seg, pa.int32()).take(pa.array(first))
    cols = [node_ids, segs]
    dirs = df["dir"].to_numpy()
    for direction, child in (("o", "obj"), ("i", "subj")):
        m = dirs == direction
        counts = np.bincount(kid[m], minlength=nkeys)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        sub = df.filter(pl.Series(m))
        struct = pa.StructArray.from_arrays(
            [_arr(sub["pred"], pa.string()), _arr(sub["other"], pa.string())],
            names=["pred", child],
        )
        cols.append(pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct))
    return pa.Table.from_arrays(cols, schema=ADJ_SCHEMA)


def build_adjacency(triples_ds, nbuckets: int = 64,
                    degree_cap: int | None = 500_000,
                    hot_nodes: dict[str, int] | None = None):
    """Materialize adjacency lists. ``degree_cap`` bounds the edges per
    output row: higher-degree nodes split into hash-segments (None
    disables the heavy-hitter sampling pass). ``hot_nodes`` supplies a
    precomputed {node_id: est_degree} map instead — the streaming
    pipeline derives it from the link-prescan pass (linking.py), since
    sampling here would force the lazy triple stream to execute."""
    if hot_nodes is not None:
        hot = ({} if degree_cap is None else
               {n: segments_for(est, degree_cap)
                for n, est in hot_nodes.items() if est > degree_cap})
    else:
        hot = (
            find_hot_degree_nodes(triples_ds, degree_cap)
            if degree_cap is not None
            else {}
        )
    return (
        # explicit batch_size: coalesces the (possibly fragmented) triple
        # blocks so the per-batch combiner sees enough rows per node to
        # actually compress the shuffle
        triples_ds.map_batches(
            # 4x buckets per reduce partition: the shuffle's sampled
            # range boundaries then never repeat (repeats → empty
            # zero-schema reduce blocks), while reduce parallelism stays
            # at the input block count pinned below
            _emit_partials(nbuckets * 4, hot), batch_format="pyarrow",
            batch_size=131072,
        )
        # coalesce the partial blocks: reducers = input block count, and
        # dozens of full blocks beat hundreds of tiny ones in sort cost
        .repartition(nbuckets)
        .groupby("__bucket")
        .map_groups(_assemble, batch_format="pyarrow")
    )


_pd = pd  # pandas used inside _assemble via to_pandas
