"""Partial (combiner-style) aggregation (SURVEY.md §2.5, ray_guide
"Aggregation at scale").

A bare ``ds.groupby(k).aggregate(...)`` shuffles every row. These
helpers pre-aggregate inside ``map_batches`` with pyarrow's C++
``Table.group_by`` — one partial row per key per block — then run the
(cheap) final groupby over partials only. At 100 TB this is the
difference between shuffling terabytes and shuffling kilobytes.
"""

from __future__ import annotations

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
