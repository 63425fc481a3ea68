"""Join strategies (SURVEY.md §2.4).

- ``broadcast_join``: the small side is ``ray.put`` ONCE on the driver;
  each actor fetches it once in ``__init__`` (never per batch) and does
  a vectorized pandas merge per batch. No shuffle — the right tool for
  dimension tables (customer, nation, region) and lookup maps.
- ``bucketed_join``: both sides large → add ``hash(key) % B`` to each,
  groupby the bucket, Arrow hash-join matching buckets inside the group.
  This is the explicit partitioned hash join; salt hot keys upstream if
  a key dominates (see stages.linking for the salting pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import blocks_for_keys


def broadcast_join(ds, small_df: pd.DataFrame, on, how: str = "inner"):
    import ray

    ref = ray.put(small_df)

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        # ray.get on an owned plasma object is zero-copy shared memory —
        # effectively free after the worker's first fetch; stateless
        # tasks reuse warm workers, so no actor-pool spin-up cost
        return batch.merge(ray.get(ref), on=on, how=how)

    return ds.map_batches(join, batch_format="pandas")


def bucketed_join(left, right, on: list[str], nbuckets: int = 32,
                  how: str = "inner"):
    """Partitioned hash join for two large Datasets. Left rows tagged
    side=0, right side=1; one shuffle on the bucket; Arrow join within."""

    def _arrow_fields(ds) -> list[tuple[str, pa.DataType]]:
        s = ds.schema()
        out = []
        for name, typ in zip(s.names, s.types):
            if not isinstance(typ, pa.DataType):
                try:
                    typ = pa.from_numpy_dtype(typ)
                except (pa.ArrowNotImplementedError, TypeError):
                    typ = pa.string()  # pandas object dtype
            out.append((name, typ))
        return out

    lfields = _arrow_fields(left)
    rfields = _arrow_fields(right)
    lcols = [n for n, _ in lfields]
    rcols = [n for n, _ in rfields]
    # union schema: join keys once, then each side's other columns
    union_fields = lfields + [(n, t) for n, t in rfields if n not in set(lcols)]

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            import polars as pl
            import pyarrow.compute as pc

            n = batch.num_rows
            if n == 0:
                buckets = pa.array([], pa.int32())
            else:
                combined = pc.binary_join_element_wise(
                    *[pc.fill_null(pc.cast(batch[c], pa.string()), "None")
                      for c in on],
                    "\x1f",
                )
                h = pl.Series(pl.from_arrow(combined)).hash(seed=0).to_numpy()
                buckets = pa.array(
                    (h % np.uint64(nbuckets)).astype(np.int32), pa.int32()
                )
            arrays, names = [], []
            for name, typ in union_fields:
                names.append(name)
                if name in batch.column_names:
                    arrays.append(batch[name].combine_chunks().cast(typ))
                else:
                    arrays.append(pa.nulls(n, typ))
            names += ["__jbucket", "__side"]
            arrays += [buckets, pa.array([side] * n, pa.int32())]
            return pa.table(dict(zip(names, arrays)))

        return fn

    lt = left.map_batches(tag(0), batch_format="pyarrow")
    rt = right.map_batches(tag(1), batch_format="pyarrow")

    out_schema = pa.schema(union_fields)
    join_type = {"inner": "inner", "left": "left outer",
                 "right": "right outer", "outer": "full outer"}[how]

    def merge(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # Arrow-native hash join per bucket (round-3 VERDICT item 7):
        # no pandas round-trip, null-padded int columns keep their type,
        # and full-outer key coalescing matches SQL semantics. Nulls in
        # join keys never match (SQL/DuckDB semantics — pandas merge
        # would have matched NaN keys).
        ls = g.filter(pc.equal(g["__side"], 0)).select(lcols).combine_chunks()
        rs = g.filter(pc.equal(g["__side"], 1)).select(rcols).combine_chunks()
        out = ls.join(rs, keys=list(on), join_type=join_type)
        # select pins the union column order; cast pins the schema so an
        # empty bucket can't poison downstream schema unification
        return out.select([n for n, _ in union_fields]).cast(out_schema)

    return (lt.union(rt).repartition(blocks_for_keys(nbuckets))
            .groupby("__jbucket").map_groups(merge, batch_format="pyarrow"))


def asof_join(left, right, on: str, by: list[str], *,
              suffix: str = "_r", nbuckets: int = 32,
              allow_exact_matches: bool = True,
              tiebreak: str | None = None):
    """As-of (inner, backward) join — an operator Ray Data lacks: each
    left row pairs with the right row having the greatest ``on`` value
    ≤ its own, within the same ``by`` group (DuckDB/kdb ASOF JOIN
    semantics; ``pd.merge_asof`` kernel per bucket).

    PARTITIONING ASSUMPTION (the one this composition relies on): all
    rows of one ``by`` group land in one shuffle bucket — guaranteed by
    hashing the ``by`` columns. Group sizes must fit a worker batch;
    for a pathological group (one user with 10^8 events) pre-split the
    ``on`` axis into coarse time ranges and replicate the preceding
    range's tail row, exactly like the windows stage documents.

    ``tiebreak``: optional RIGHT-side column (original name) used as a
    deterministic secondary sort key — when several right rows share an
    ``on`` value within a ``by`` group, the row with the MAX tiebreak
    wins (merge_asof keeps the last sorted row). Without it the winner
    among ties is whatever order the shuffle delivered (round-2
    ADVICE); mirror the tie-break in any SQL oracle with
    ``ORDER BY r.on DESC, r.tiebreak DESC ... rn = 1``."""

    def _fields(ds) -> list[tuple[str, pa.DataType]]:
        s = ds.schema()
        return list(zip(s.names, s.types))

    lfields = _fields(left)
    rfields = _fields(right)
    lcols = [n for n, _ in lfields]
    rcols = [n for n, _ in rfields]
    rren = {n: (n if n in by or n == on else n + suffix) for n in rcols}
    out_fields = lfields + [
        (rren[n], t) for n, t in rfields if rren[n] not in set(lcols)
    ]
    out_schema = pa.schema(out_fields)

    def tag(side: int, cols):
        def fn(batch: pa.Table) -> pa.Table:
            import polars as pl
            import pyarrow.compute as pc

            n = batch.num_rows
            if n == 0:
                buckets = pa.array([], pa.int32())
            else:
                combined = pc.binary_join_element_wise(
                    *[pc.fill_null(pc.cast(batch[c], pa.string()), "None")
                      for c in by],
                    "\x1f",
                )
                h = pl.Series(pl.from_arrow(combined)).hash(seed=0).to_numpy()
                buckets = pa.array(
                    (h % np.uint64(nbuckets)).astype(np.int32), pa.int32()
                )
            names, arrays = [], []
            for name, typ in lfields + [(rn, t) for (n2, t), rn in
                                        zip(rfields, [rren[c] for c in rcols])
                                        if rn not in set(lcols)]:
                names.append(name)
                src = None
                if side == 0 and name in batch.column_names:
                    src = name
                elif side == 1:
                    orig = next((c for c in rcols if rren[c] == name), None)
                    if orig is not None and orig in batch.column_names:
                        src = orig
                if src is not None:
                    arrays.append(batch[src].combine_chunks().cast(typ))
                else:
                    arrays.append(pa.nulls(batch.num_rows, typ))
            names += ["__jbucket", "__side"]
            arrays += [buckets, pa.array([side] * batch.num_rows, pa.int32())]
            return pa.table(dict(zip(names, arrays)))

        return fn

    lt = left.map_batches(tag(0, lcols), batch_format="pyarrow")
    rt = right.map_batches(tag(1, rcols), batch_format="pyarrow")
    rout = [rren[c] for c in rcols]
    tb = rren.get(tiebreak) if tiebreak else None

    def merge(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ls = g.filter(pc.equal(g["__side"], 0)).select(lcols).to_pandas()
        rs = g.filter(pc.equal(g["__side"], 1)).select(rout).to_pandas()
        if not len(ls) or not len(rs):
            return out_schema.empty_table()
        ls = ls.sort_values(on, kind="stable")
        rs = rs.sort_values([on, tb] if tb else on, kind="stable")
        # explicit match indicator: a payload column can be legitimately
        # NULL in a matched right row (and the right side may have no
        # payload at all), so never probe payload columns for matches
        rs = rs.assign(__m=np.int8(1))
        out = pd.merge_asof(
            ls, rs, on=on, by=by, direction="backward",
            allow_exact_matches=allow_exact_matches,
            suffixes=("", suffix),
        )
        # inner semantics: drop left rows with no as-of match
        out = out[out["__m"].notna()]
        for name, typ in out_fields:  # restore int dtypes NaN degraded
            if pa.types.is_integer(typ):
                # nullable Int64: matched rows may carry NULL payloads
                out[name] = out[name].astype("Int64")
        return pa.Table.from_pandas(
            out[[n for n, _ in out_fields]], schema=out_schema,
            preserve_index=False,
        ).replace_schema_metadata(None)

    return (lt.union(rt).repartition(blocks_for_keys(nbuckets))
            .groupby("__jbucket").map_groups(merge, batch_format="pyarrow"))


def range_join(left, right, by: list[str], *, left_on: str, right_on: str,
               lo_offset, hi_offset, suffix: str = "_r", nbuckets: int = 32):
    """Range (interval) join — the second operator Ray Data lacks: each
    left row pairs with EVERY right row of the same ``by`` group whose
    ``right_on`` lies in ``[left_on + lo_offset, left_on + hi_offset]``.
    One-to-many by construction (an event joined to all events of the
    preceding hour), unlike ``asof_join``'s one-to-one.

    Same partitioning assumption as ``asof_join``: one ``by`` group ↔
    one shuffle bucket. Within a bucket the match is a vectorized
    equi-merge on ``by`` followed by a between-filter — per-group
    output is inherently up to |L_g|×|R_g|; keep ``by`` selective (the
    standard range-join caveat, documented here on purpose)."""

    def _fields(ds):
        s = ds.schema()
        return list(zip(s.names, s.types))

    lfields = _fields(left)
    rfields = _fields(right)
    lcols = [n for n, _ in lfields]
    rcols = [n for n, _ in rfields]
    rren = {n: (n if n in by else n + suffix) for n in rcols}
    out_fields = lfields + [
        (rren[n], t) for n, t in rfields if rren[n] not in set(lcols)
    ]
    out_schema = pa.schema(out_fields)

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            import polars as pl
            import pyarrow.compute as pc

            n = batch.num_rows
            if n == 0:
                buckets = pa.array([], pa.int32())
            else:
                combined = pc.binary_join_element_wise(
                    *[pc.fill_null(pc.cast(batch[c], pa.string()), "None")
                      for c in by],
                    "\x1f",
                )
                h = pl.Series(pl.from_arrow(combined)).hash(seed=0).to_numpy()
                buckets = pa.array(
                    (h % np.uint64(nbuckets)).astype(np.int32), pa.int32()
                )
            names, arrays = [], []
            for name, typ in out_fields:
                names.append(name)
                if side == 0 and name in set(lcols):
                    arrays.append(batch[name].combine_chunks().cast(typ))
                elif side == 1:
                    orig = next((c for c in rcols if rren[c] == name), None)
                    if orig is not None:
                        arrays.append(batch[orig].combine_chunks().cast(typ))
                    else:
                        arrays.append(pa.nulls(n, typ))
                else:
                    arrays.append(pa.nulls(n, typ))
            names += ["__jbucket", "__side"]
            arrays += [buckets, pa.array([side] * n, pa.int32())]
            return pa.table(dict(zip(names, arrays)))

        return fn

    lt = left.map_batches(tag(0), batch_format="pyarrow")
    rt = right.map_batches(tag(1), batch_format="pyarrow")
    rout = [rren[c] for c in rcols]
    r_on = rren[right_on]

    def merge(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # Arrow-native equi-join + between-filter (round-3 VERDICT
        # item 7; only asof_join keeps pandas, for merge_asof)
        ls = g.filter(pc.equal(g["__side"], 0)).select(lcols).combine_chunks()
        rs = g.filter(pc.equal(g["__side"], 1)).select(rout).combine_chunks()
        if not ls.num_rows or not rs.num_rows:
            return out_schema.empty_table()
        out = ls.join(rs, keys=list(by), join_type="inner")
        lo = pc.add(out[left_on], pa.scalar(lo_offset))
        hi = pc.add(out[left_on], pa.scalar(hi_offset))
        mask = pc.and_(pc.greater_equal(out[r_on], lo),
                       pc.less_equal(out[r_on], hi))
        return (out.filter(mask)
                .select([n for n, _ in out_fields]).cast(out_schema))

    return (lt.union(rt).repartition(blocks_for_keys(nbuckets))
            .groupby("__jbucket").map_groups(merge, batch_format="pyarrow"))


def interval_join(left, right, by: list[str], *,
                  left_lo: str = "lo", left_hi: str = "hi",
                  right_lo: str = "lo", right_hi: str = "hi",
                  suffix: str = "_r", nbuckets: int = 32):
    """Keyed INTERVAL-OVERLAP join — pairs of rows with the same
    ``by`` key whose closed intervals intersect
    ([l.lo, l.hi] ∩ [r.lo, r.hi] ≠ ∅, i.e. l.lo <= r.hi AND
    r.lo <= l.hi). The interval×interval sibling of asof_join
    (nearest-point) and the range join (point-in-interval) — Ray Data
    has none of the three.

    Shape: one hash shuffle on the ``by`` key (tagged union, both
    sides renamed to one internal schema); per bucket the right side
    sorts by lo and each left interval takes the right rows in its
    searchsorted lo-window, then filters on hi —
    O(n log n + candidates) per key. PARTITIONING ASSUMPTION (same as
    asof_join): one key's rows fit a bucket; for keyless use or one
    giant key, pre-split the time axis into coarse ranges and emit
    each pair only in the range owning max(l.lo, r.lo) — the standard
    dedup-free interval bucketing. Output columns:
    (by..., left_lo, left_hi, right_lo+suffix, right_hi+suffix)."""
    out_rlo, out_rhi = right_lo + suffix, right_hi + suffix

    def keyed(side: int, lo_col: str, hi_col: str):
        def fn(t: pa.Table) -> pa.Table:
            import polars as pl
            import pyarrow.compute as pc

            n = t.num_rows
            cols = {c: t[c] for c in by}
            cols["__lo"] = t[lo_col]
            cols["__hi"] = t[hi_col]
            sel = pa.table(cols)
            if n == 0:
                buckets = pa.array([], pa.int32())
            else:
                combined = pc.binary_join_element_wise(
                    *[pc.fill_null(pc.cast(sel[c], pa.string()), "None")
                      for c in by], "\x1f")
                h = pl.Series(pl.from_arrow(combined)).hash(seed=0).to_numpy()
                buckets = pa.array(
                    (h % np.uint64(nbuckets)).astype(np.int32), pa.int32())
            return sel.append_column("__jbucket", buckets).append_column(
                "__side", pa.array([side] * n, pa.int32()))

        return fn

    lt = left.map_batches(keyed(0, left_lo, left_hi),
                          batch_format="pyarrow")
    rt = right.map_batches(keyed(1, right_lo, right_hi),
                           batch_format="pyarrow")
    out_cols = [*by, left_lo, left_hi, out_rlo, out_rhi]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        ls = g[g["__side"] == 0]
        rs = g[g["__side"] == 1]
        outs = []
        for key, lsub in ls.groupby(by, sort=False):
            key_t = key if isinstance(key, tuple) else (key,)
            rsub = rs
            for c, v in zip(by, key_t):
                rsub = rsub[rsub[c] == v]
            if not len(rsub):
                continue
            rlo = rsub["__lo"].to_numpy()
            rhi = rsub["__hi"].to_numpy()
            o = np.argsort(rlo, kind="stable")
            rlo, rhi = rlo[o], rhi[o]
            llo = lsub["__lo"].to_numpy()
            lhi = lsub["__hi"].to_numpy()
            ends = np.searchsorted(rlo, lhi, side="right")
            li, ri = [], []
            for i, e in enumerate(ends):
                if e == 0:
                    continue
                w = np.nonzero(rhi[:e] >= llo[i])[0]
                if len(w):
                    li.append(np.full(len(w), i))
                    ri.append(w)
            if not li:
                continue
            lidx = np.concatenate(li).astype(np.int64)
            ridx = np.concatenate(ri).astype(np.int64)
            out = pd.DataFrame(
                {c: np.repeat(lsub[c].iloc[0], len(lidx)) for c in by})
            out[left_lo] = llo[lidx]
            out[left_hi] = lhi[lidx]
            out[out_rlo] = rlo[ridx]
            out[out_rhi] = rhi[ridx]
            outs.append(out)
        if not outs:
            return pd.DataFrame({
                **{c: pd.Series([], dtype=g[c].dtype) for c in by},
                left_lo: pd.Series([], dtype=g["__lo"].dtype),
                left_hi: pd.Series([], dtype=g["__hi"].dtype),
                out_rlo: pd.Series([], dtype=g["__lo"].dtype),
                out_rhi: pd.Series([], dtype=g["__hi"].dtype),
            })
        return pd.concat(outs, ignore_index=True)[out_cols]

    return (lt.union(rt).repartition(blocks_for_keys(nbuckets))
            .groupby("__jbucket")
            .map_groups(lambda g: merge(g.drop(columns=["__jbucket"])),
                        batch_format="pandas"))
