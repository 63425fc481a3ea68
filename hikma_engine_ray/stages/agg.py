"""Partial (combiner-style) aggregation (SURVEY.md §2.5, ray_guide
"Aggregation at scale").

A bare ``ds.groupby(k).aggregate(...)`` shuffles every row. These
helpers pre-aggregate inside ``map_batches`` with pyarrow's C++
``Table.group_by`` — one partial row per key per block — then run the
(cheap) final groupby over partials only. At 100 TB this is the
difference between shuffling terabytes and shuffling kilobytes.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


# aggregate spec: out_col -> (in_col, kind); kind ∈ sum|count|min|max
# (mean is computed downstream as sum/count)

def partial_agg(keys: list[str], spec: dict[str, tuple[str, str]]):
    """map_batches fn emitting per-block partials for the given spec."""
    pa_aggs = []
    renames = {}
    for out, (col, kind) in spec.items():
        pa_aggs.append((col, kind))
        renames[f"{col}_{kind}"] = out

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            fields = [(k, t.schema.field(k).type) for k in keys]
            for out, (col, kind) in spec.items():
                typ = pa.int64() if kind == "count" else t.schema.field(col).type
                fields.append((out, typ))
            return pa.schema(fields).empty_table()
        g = t.group_by(keys).aggregate(pa_aggs)
        names = [renames.get(n, n) for n in g.column_names]
        return g.rename_columns(names)

    return fn


def final_agg(partials, keys: list[str], spec: dict[str, tuple[str, str]]):
    """Final combine over partials: sum/count → Sum, min → Min, max → Max."""
    from ray.data.aggregate import Max, Min, Sum

    aggs = []
    for out, (_col, kind) in spec.items():
        if kind in ("sum", "count"):
            aggs.append(Sum(out, alias_name=out))
        elif kind == "min":
            aggs.append(Min(out, alias_name=out))
        elif kind == "max":
            aggs.append(Max(out, alias_name=out))
        else:
            raise ValueError(kind)
    return partials.groupby(keys).aggregate(*aggs)


def grouped_agg(ds, keys: list[str], spec: dict[str, tuple[str, str]],
                batch_size: int = 65536):
    """partial-per-block + tiny final shuffle, in one call."""
    partials = ds.map_batches(
        partial_agg(keys, spec), batch_format="pyarrow", batch_size=batch_size
    )
    return final_agg(partials, keys, spec)


def distinct_count(ds, value_cols: list[str], group_cols: list[str] | None = None,
                   nbuckets: int = 32):
    """Exact COUNT(DISTINCT value_cols) [per group_cols], combiner-first:
    each block collapses to its DISTINCT (group, value) rows before the
    shuffle, the groupby dedups globally per hash bucket, and a tiny
    count-per-group aggregate finishes. Shuffle volume = distinct keys
    per block, never row count. (Swap the exact per-bucket set for an
    HLL sketch at the same seam when approximate is acceptable.)"""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .dedup import BUCKET_COL, add_bucket_column

    group_cols = group_cols or []
    cols = group_cols + value_cols

    def partial(t: pa.Table) -> pa.Table:
        return t.select(cols).group_by(cols).aggregate([])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=cols)
        out = (
            # dropna=False: SQL GROUP BY keeps the NULL group
            g.groupby(group_cols, sort=False, dropna=False).size().reset_index(name="n")
            if group_cols
            else pd.DataFrame({"n": [len(g)]})
        )
        for c in group_cols:  # NaN group key → proper null
            out[c] = out[c].astype("object").where(pd.notna(out[c]), None)
        out["n"] = out["n"].astype("int64")
        return out

    bucketed = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_bucket_column(cols, nbuckets), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(per_bucket, batch_format="pandas")
    )
    del pc
    if group_cols:
        return bucketed.groupby(group_cols).aggregate(Sum("n", alias_name="n"))
    row = bucketed.aggregate(Sum("n", alias_name="n"))
    return pd.DataFrame([{"n": int(row["n"] or 0)}])
