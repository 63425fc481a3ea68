"""Adjacency-list materialization (SURVEY.md §2.5 A1, §1.4).

Replaces the reference's driver-memory whole-graph maps
(in-memory-graph.ts:33-141) with a distributed build:

  1. double-emit each triple — (node=subj, dir=out) and (node=obj,
     dir=in) — vectorized in Arrow;
  2. **partial aggregation per block**: group (bucket, node, dir) with
     Arrow's hash_list so the shuffle moves one compressed list-row per
     node per block instead of one row per edge (triples are emitted
     per-file, so a node's edges are nearly block-local → ~3-10× fewer
     shuffled rows);
  3. one bucketed shuffle; per bucket: flatten partials (vectorized
     list_flatten / list_parent_indices), sort, and assemble the final
     ``out``/``in`` struct lists from offsets.

Output schema: ``node_id, out: list<struct<pred,obj>>,
in: list<struct<pred,subj>>`` — one row per node.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

ADJ_SCHEMA = pa.schema(
    [
        ("node_id", pa.string()),
        ("out", pa.list_(pa.struct([("pred", pa.string()), ("obj", pa.string())]))),
        ("in", pa.list_(pa.struct([("pred", pa.string()), ("subj", pa.string())]))),
    ]
)


def _emit_partials(nbuckets: int):
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
        buckets = (h % np.uint64(nbuckets)).astype(np.int32)
        t = pa.table(
            {
                "node_id": node,
                "dir": direction,
                "pred": pa.chunked_array([pred, pred]).combine_chunks(),
                "other": other,
                "__bucket": pa.array(buckets, pa.int32()),
            }
        )
        # combiner: one list-row per (bucket, node, dir) per block
        g = t.group_by(["__bucket", "node_id", "dir"]).aggregate(
            [("pred", "list"), ("other", "list")]
        )
        return g.rename_columns(
            ["__bucket", "node_id", "dir", "pred_list", "other_list"]
        )

    return fn


def _assemble(g: pa.Table) -> pa.Table:
    """Per bucket: flatten partial lists back to edge rows (vectorized),
    sort, and build the final out/in struct lists from offsets."""
    parent = pc.list_parent_indices(g["pred_list"])
    flat = pa.table(
        {
            "node_id": pc.take(g["node_id"], parent),
            "dir": pc.take(g["dir"], parent),
            "pred": pc.list_flatten(g["pred_list"]),
            "other": pc.list_flatten(g["other_list"]),
        }
    )
    df = flat.to_pandas()
    df = df.sort_values(["node_id", "pred", "other"], kind="stable")
    nodes = np.unique(df["node_id"].to_numpy())
    cols = [pa.array(nodes, pa.string())]
    for direction, child in (("o", "obj"), ("i", "subj")):
        d = df[df["dir"].to_numpy() == direction]
        idx = np.searchsorted(nodes, d["node_id"].to_numpy())
        counts = np.bincount(idx, minlength=len(nodes))
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        struct = pa.StructArray.from_arrays(
            [pa.array(d["pred"].to_numpy(), pa.string()),
             pa.array(d["other"].to_numpy(), pa.string())],
            names=["pred", child],
        )
        cols.append(pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct))
    return pa.Table.from_arrays(cols, schema=ADJ_SCHEMA)


def build_adjacency(triples_ds, nbuckets: int = 64):
    return (
        triples_ds.map_batches(_emit_partials(nbuckets), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_assemble, batch_format="pyarrow")
    )


_pd = pd  # pandas used inside _assemble via to_pandas
