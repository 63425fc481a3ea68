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
        rows_id: list[str] = []
        rows_out: list[list] = []
        rows_in: list[list] = []
        for node, sub in g.groupby("node_id", sort=True):
            is_out = sub["dir"].to_numpy() == "o"
            out_list = [
                {"pred": p, "obj": o}
                for p, o in sorted(zip(sub["pred"][is_out], sub["other"][is_out]))
            ]
            in_list = [
                {"pred": p, "subj": s}
                for p, s in sorted(zip(sub["pred"][~is_out], sub["other"][~is_out]))
            ]
            rows_id.append(node)
            rows_out.append(out_list)
            rows_in.append(in_list)
        return pa.Table.from_arrays(
            [
                pa.array(rows_id, pa.string()),
                pa.array(rows_out, ADJ_SCHEMA.field("out").type),
                pa.array(rows_in, ADJ_SCHEMA.field("in").type),
            ],
            schema=ADJ_SCHEMA,
        )

    return (
        triples_ds.map_batches(_emit_both_directions(nbuckets), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
