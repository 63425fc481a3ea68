"""Adjacency-list materialization (SURVEY.md §2.5 A1, §1.4).

Replaces the reference's driver-memory whole-graph maps
(in-memory-graph.ts:33-141) with a distributed build: each triple is
emitted twice — (node=subj, dir=out) and (node=obj, dir=in) — then one
bucketed shuffle groups by node and a vectorized pandas groupby inside
each bucket assembles the out/in struct lists. Output schema:
``node_id, out: list<struct<pred,obj>>, in: list<struct<pred,subj>>``.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

ADJ_SCHEMA = pa.schema(
    [
        ("node_id", pa.string()),
        ("out", pa.list_(pa.struct([("pred", pa.string()), ("obj", pa.string())]))),
        ("in", pa.list_(pa.struct([("pred", pa.string()), ("subj", pa.string())]))),
    ]
)


def _emit_both_directions(nbuckets: int):
    def fn(batch: pa.Table) -> pa.Table:
        subj = batch["subj"].to_pylist()
        pred = batch["pred"].to_pylist()
        obj = batch["obj"].to_pylist()
        n = len(subj)
        node = subj + obj
        direction = ["o"] * n + ["i"] * n
        other = obj + subj
        buckets = np.fromiter(
            (zlib.crc32(x.encode()) % nbuckets for x in node),
            dtype=np.int32,
            count=2 * n,
        )
        return pa.table(
            {
                "node_id": pa.array(node, pa.string()),
                "dir": pa.array(direction, pa.string()),
                "pred": pa.array(pred + pred, pa.string()),
                "other": pa.array(other, pa.string()),
                "__bucket": pa.array(buckets, pa.int32()),
            }
        )

    return fn


def build_adjacency(triples_ds, nbuckets: int = 64):
    def per_bucket(g: pd.DataFrame) -> pa.Table:
        # fully vectorized list assembly: sort once, then build Arrow
        # list<struct> columns from offsets — no per-node Python loop
        g = g.sort_values(["node_id", "pred", "other"], kind="stable")
        nodes = np.unique(g["node_id"].to_numpy())
        cols = [pa.array(nodes, pa.string())]
        for direction, child in (("o", "obj"), ("i", "subj")):
            d = g[g["dir"].to_numpy() == direction]
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

    return (
        triples_ds.map_batches(_emit_both_directions(nbuckets), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
