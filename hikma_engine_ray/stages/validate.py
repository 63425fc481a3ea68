"""Graph validation (SURVEY.md §2.2 M14 / §2.4 J7).

The reference validates node/edge integrity in driver memory
(data-loader.ts:1170-1267) and finds orphan edges with a SQL LEFT JOIN
(:1088-1099). Distributed equivalents:

  orphan_edges   triples whose obj is neither a known node id nor an
                 external ``module:*`` sink — a bucketed LEFT ANTI join
                 (union-tagged shuffle on the id, no driver-side sets)
  duplicate_ids  node ids seen more than once (groupby count > 1)

Both shuffle only (id, tag) pairs — never node payloads.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import blocks_for_keys


def _tag_ids(col: str, tag: str, nbuckets: int):
    def fn(t: pa.Table) -> pa.Table:
        import polars as pl

        ids = t[col].combine_chunks()
        h = pl.Series(pl.from_arrow(ids)).hash(seed=0).to_numpy()
        return pa.table(
            {
                "id": ids,
                "tag": pa.nulls(len(ids), pa.string()).fill_null(tag),
                "__bucket": pa.array((h % np.uint64(nbuckets)).astype(np.int32), pa.int32()),
            }
        )

    return fn


def orphan_edge_objs(nodes_ds, triples_ds, nbuckets: int = 32):
    """Distinct triple objs with no matching node (anti-join). External
    ``module:*`` sinks are excluded up front (they are sinks by design),
    as are READS/WRITES targets — those are the reference's PLACEHOLDER
    variable business keys (enhanced-ast-parser.ts:607-628 creates
    ``{fileId}#{name}#{line}`` keys with no backing node), SPEC v3 R4."""

    internal_objs = triples_ds.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.invert(
                    pc.starts_with(pc.fill_null(t["obj"], ""), "module:")
                ),
                pc.invert(
                    pc.is_in(t["pred"],
                             value_set=pa.array(["READS", "WRITES"]))
                ),
            )
        ),
        batch_format="pyarrow",
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        have = set(g.loc[g["tag"] == "n", "id"])
        objs = g.loc[g["tag"] == "e", "id"]
        missing = sorted(set(objs) - have)
        return pd.DataFrame({"obj": pd.Series(missing, dtype="object")})

    tagged = nodes_ds.map_batches(
        _tag_ids("node_id", "n", nbuckets), batch_format="pyarrow"
    ).union(
        internal_objs.map_batches(_tag_ids("obj", "e", nbuckets), batch_format="pyarrow")
    )
    return (tagged.repartition(blocks_for_keys(nbuckets))
            .groupby("__bucket").map_groups(per_bucket, batch_format="pandas"))


def duplicate_node_ids(nodes_ds, nbuckets: int = 32):
    """Node ids occurring more than once (data-loader.ts:1258-1264)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"node_id": t["node_id"]}).group_by("node_id").aggregate(
            [("node_id", "count")]
        )
        return g.rename_columns(["node_id", "n"])

    counts = (
        nodes_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("node_id")
        .aggregate(Sum("n", alias_name="n"))
    )
    return counts.filter(expr="n > 1")


def validate_graph(graph: dict) -> dict:
    """Driver-facing summary — counts only (results are small)."""
    orphans = orphan_edge_objs(graph["nodes"], graph["triples"]).count()
    dups = duplicate_node_ids(graph["nodes"]).count()
    return {"orphan_edge_objs": orphans, "duplicate_node_ids": dups}
