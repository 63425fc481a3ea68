"""Event-time windowing over log-shaped tables (ray_guide "streaming-
shaped workloads"). Ray Data has no watermarks; windows are expressed
as grouped computations over event time:

  tumbling   groupby(key, floor(ts / size))          — pure shuffle agg
  sliding    each event replicated to the ⌈size/step⌉ windows it falls
             in, then the same grouped aggregate
  session    per-key gaps-and-islands: sort the key's events by ts,
             new session when gap > timeout (vectorized cumsum inside a
             bucketed per-key pass)

Ordering assumption (documented per guide): events for one key are
grouped before sessionizing; no cross-key order is assumed; late data
simply lands in its window (no watermark semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def tumbling(ds, key: str, ts_col: str, value_col: str, size_sec: int):
    from .agg import grouped_agg

    def bucket(t: pa.Table) -> pa.Table:
        epoch = pc.cast(pc.cast(t[ts_col], pa.int64()), pa.int64())  # µs
        win = pc.multiply(
            pc.divide(epoch, pa.scalar(size_sec * 1_000_000, pa.int64())),
            pa.scalar(size_sec * 1_000_000, pa.int64()),
        )
        return pa.table(
            {"window_start": win, key: t[key], value_col: t[value_col]}
        )

    return grouped_agg(
        ds.map_batches(bucket, batch_format="pyarrow"),
        keys=["window_start", key],
        spec={"n": (value_col, "count"), "sum_value": (value_col, "sum")},
    )


def sliding(ds, key: str, ts_col: str, value_col: str, size_sec: int, step_sec: int):
    assert size_sec % step_sec == 0
    k = size_sec // step_sec
    from .agg import grouped_agg

    def replicate(t: pa.Table) -> pa.Table:
        epoch = pc.cast(pc.cast(t[ts_col], pa.int64()), pa.int64()).to_numpy()
        keys = t[key].to_pylist()
        vals = t[value_col].to_pylist()
        step = step_sec * 1_000_000
        size = size_sec * 1_000_000
        out_w, out_k, out_v = [], [], []
        base = (epoch // step) * step
        for j in range(k):
            starts = base - j * step
            ok = epoch < starts + size
            for i in np.nonzero(ok)[0]:
                out_w.append(int(starts[i]))
                out_k.append(keys[i])
                out_v.append(vals[i])
        return pa.table(
            {
                "window_start": pa.array(out_w, pa.int64()),
                key: pa.array(out_k),
                value_col: pa.array(out_v),
            }
        )

    return grouped_agg(
        ds.map_batches(replicate, batch_format="pyarrow"),
        keys=["window_start", key],
        spec={"n": (value_col, "count"), "sum_value": (value_col, "sum")},
    )


def sessionize(ds, key: str, ts_col: str, timeout_sec: int, nbuckets: int = 16):
    """Per-key sessions (gap > timeout starts a new one). One bucketed
    shuffle on the key; inside each bucket a single vectorized pandas
    pass (sort + diff + cumsum) — no per-event Python.

    Output: key, session_start (µs), session_end (µs), n_events.
    """
    from .dedup import BUCKET_COL, add_bucket_column, blocks_for_keys

    gap = timeout_sec * 1_000_000

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col], kind="stable")
        ts = g[ts_col].astype("int64").to_numpy()
        keys = g[key].to_numpy()
        new_key = np.empty(len(g), dtype=bool)
        new_key[0:1] = True
        new_key[1:] = keys[1:] != keys[:-1]
        gap_break = np.empty(len(g), dtype=bool)
        gap_break[0:1] = True
        gap_break[1:] = (ts[1:] - ts[:-1]) > gap
        session_id = np.cumsum(new_key | gap_break)
        df = pd.DataFrame({key: keys, "ts": ts, "sid": session_id})
        out = df.groupby("sid").agg(
            **{
                key: (key, "first"),
                "session_start": ("ts", "min"),
                "session_end": ("ts", "max"),
                "n_events": ("ts", "size"),
            }
        )
        return out.reset_index(drop=True)

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table(
            {key: t[key], ts_col: pc.cast(pc.cast(t[ts_col], pa.int64()), pa.int64())}
        )

    return (
        ds.map_batches(to_us, batch_format="pyarrow")
        .map_batches(add_bucket_column([key], nbuckets), batch_format="pyarrow")
        .repartition(blocks_for_keys(nbuckets))
        .groupby(BUCKET_COL)
        .map_groups(
            lambda g: per_bucket(g.drop(columns=[BUCKET_COL])),
            batch_format="pandas",
        )
    )


def _per_key_rows(ds, key: str, order_cols: list[str], fn, nbuckets: int = 16):
    """Row-level window machinery: one bucketed shuffle on ``key``,
    then inside each bucket a single vectorized pandas pass that sorts
    by (key, *order_cols) and applies ``fn`` — which receives the
    sorted frame plus a boolean "first row of its key" mask and returns
    the output frame. Per-key state never crosses the bucket, so block
    layout cannot change results; keys are hash-spread so no bucket
    holds more than ~|rows|/nbuckets (skew = one hot key's rows,
    documented per the north rule)."""
    from .dedup import BUCKET_COL, add_bucket_column, blocks_for_keys

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=[BUCKET_COL]).sort_values(
            [key, *order_cols], kind="stable"
        )
        keys = g[key].to_numpy()
        first = np.empty(len(g), dtype=bool)
        first[0:1] = True
        first[1:] = keys[1:] != keys[:-1]
        return fn(g, first)

    return (
        ds.map_batches(add_bucket_column([key], nbuckets), batch_format="pyarrow")
        .repartition(blocks_for_keys(nbuckets))
        .groupby(BUCKET_COL)
        .map_groups(per_bucket, batch_format="pandas")
    )


def lag_gap(ds, key: str, ts_col: str, id_col: str, nbuckets: int = 16):
    """LAG window: per-key time gap (µs) to the previous event, ordered
    by (ts, id). The first event of a key gets -1 (the NULL sentinel —
    the driver's value-hash is only proven on null-free columns, so
    both engine and oracle coalesce identically).

    Output: key, id, gap_us (int64)."""

    def fn(g: pd.DataFrame, first: np.ndarray) -> pd.DataFrame:
        ts = g[ts_col].astype("int64").to_numpy()
        gap = np.empty(len(g), dtype=np.int64)
        gap[0:1] = -1
        gap[1:] = ts[1:] - ts[:-1]
        gap[first] = -1
        return pd.DataFrame({
            key: g[key].to_numpy(),
            id_col: g[id_col].to_numpy(),
            "gap_us": gap,
        })

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({
            key: t[key],
            id_col: t[id_col],
            ts_col: pc.cast(pc.cast(t[ts_col], pa.int64()), pa.int64()),
        })

    return _per_key_rows(
        ds.map_batches(to_us, batch_format="pyarrow"),
        key, [ts_col, id_col], fn, nbuckets,
    )


def moving_avg(ds, key: str, ts_col: str, id_col: str, value_col: str,
               window: int = 3, ndigits: int = 4, nbuckets: int = 16):
    """ROWS-window moving average: avg(value) over the current row and
    the ``window - 1`` preceding rows of the same key, ordered by
    (ts, id) — SQL ``ROWS BETWEEN {window-1} PRECEDING AND CURRENT
    ROW``. Vectorized via cumulative sums with a per-key reset.

    Output: key, id, mov_avg (float64, rounded)."""
    from ..functions.num import round_half_away

    def fn(g: pd.DataFrame, first: np.ndarray) -> pd.DataFrame:
        v = g[value_col].astype("float64").to_numpy()
        n = len(v)
        # position of each row within its key run
        run_start = np.maximum.accumulate(
            np.where(first, np.arange(n), -1)
        )
        pos = np.arange(n) - run_start
        # explicit shifted adds IN WINDOW ORDER (oldest first) — the
        # same left-to-right accumulation a SQL window aggregator uses,
        # so the pre-rounding float matches the oracle bit-for-bit for
        # small windows (a cumsum-difference formulation would not)
        total = np.zeros(n, dtype=np.float64)
        cnt = np.ones(n, dtype=np.float64)
        for j in range(window - 1, 0, -1):
            mask = pos >= j
            shifted = np.zeros(n, dtype=np.float64)
            shifted[j:] = v[:-j]
            total = total + np.where(mask, shifted, 0.0)
            cnt += mask
        total = total + v
        return pd.DataFrame({
            key: g[key].to_numpy(),
            id_col: g[id_col].to_numpy(),
            "mov_avg": round_half_away(total / cnt, ndigits),
        })

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({
            key: t[key],
            id_col: t[id_col],
            value_col: t[value_col],
            ts_col: pc.cast(pc.cast(t[ts_col], pa.int64()), pa.int64()),
        })

    return _per_key_rows(
        ds.map_batches(to_us, batch_format="pyarrow"),
        key, [ts_col, id_col], fn, nbuckets,
    )


def funnel(ds, key: str, ts_col: str, type_col: str, steps: list[str],
           nbuckets: int = 16):
    """Ordered-funnel conversion: how many keys performed step 1, then
    step 2 strictly after their first step 1, then step 3 strictly
    after that first step 2, … (first-touch funnel — the standard
    product-analytics sequence query).

    Combiner-first: per-block min-ts per (key, step) partials (pyarrow
    group_by), a sum… min-shuffle over partials, then a per-bucket
    pandas pivot computes the ordered-prefix booleans; per-bucket
    counts reduce to ONE result row. Shuffle volume = keys × |steps|
    rows, never events.

    Output: one row — n_keys, then n_{step} cumulative-funnel counts
    in step order."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .agg import partial_agg
    from .dedup import BUCKET_COL, add_bucket_column, blocks_for_keys

    step_set = pa.array(steps)

    def pre(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t[type_col], value_set=step_set))
        return pa.table({
            key: t[key],
            type_col: t[type_col],
            "mts": pc.cast(pc.cast(t[ts_col], pa.int64()), pa.int64()),
        })

    partials = (
        ds.map_batches(pre, batch_format="pyarrow")
        .map_batches(
            partial_agg([key, type_col], {"mts": ("mts", "min")}),
            batch_format="pyarrow",
        )
    )

    cols = [f"n_{s}" for s in steps]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # global min per (key, step) — block partials may repeat a pair
        m = (g.groupby([key, type_col], sort=False)["mts"].min()
             .unstack(type_col))
        ok = None
        prev = None
        counts = {}
        for s, c in zip(steps, cols):
            ts = m[s] if s in m.columns else pd.Series(
                np.nan, index=m.index, dtype="float64")
            step_ok = ts.notna() if prev is None else (
                ok & ts.notna() & (ts > prev))
            counts[c] = int(step_ok.sum())
            ok, prev = step_ok, ts
        counts["n_keys"] = int(len(m))
        return pd.DataFrame([counts])

    bucket_counts = (
        partials.map_batches(add_bucket_column([key], nbuckets),
                             batch_format="pyarrow")
        .repartition(blocks_for_keys(nbuckets))
        .groupby(BUCKET_COL)
        .map_groups(
            lambda g: per_bucket(g.drop(columns=[BUCKET_COL])),
            batch_format="pandas",
        )
    )
    aggs = [Sum("n_keys", alias_name="n_keys")] + [
        Sum(c, alias_name=c) for c in cols
    ]
    row = bucket_counts.aggregate(*aggs)
    return pd.DataFrame([{k: int(row[k]) for k in ["n_keys"] + cols}])


def resample_daily(ds, key: str, ts_col: str, value_col: str,
                   nbuckets: int = 16, ndigits: int = 6):
    """Per-key DAILY resample with ZERO GAP FILL: one row per key per
    calendar day between that key's first and last event — missing
    days emitted with n = 0, sum_value = 0.0 (the time-series
    regularization step before any windowed model sees the stream).

    Shape: per-block (key, day) pre-aggregation (combiner) -> one
    bucket shuffle on the key -> per-key calendar reindex. Shuffle
    volume is distinct (key, day) rows, never events. PARTITIONING
    ASSUMPTION: one key's day SPAN fits a worker group — a key with a
    10-year span is 3,653 rows, trivially true; the assumption is the
    span, not the event count."""
    from ..functions.num import round_half_away
    from .dedup import BUCKET_COL, add_bucket_column, blocks_for_keys

    us_day = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        # normalize to µs first — a ns-resolution timestamp column
        # would otherwise be day-floored at the wrong scale
        epoch = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        day = pc.multiply(pc.divide(epoch, pa.scalar(us_day, pa.int64())),
                          pa.scalar(us_day, pa.int64()))
        g = pa.table({key: t[key], "__day": day,
                      "__v": pc.cast(t[value_col], pa.float64())}) \
            .group_by([key, "__day"]) \
            .aggregate([("__v", "count"), ("__v", "sum")])
        return g.rename_columns([key, "__day", "n", "sum_value"])

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def reindex(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for k, sub in g.groupby(key, sort=False):
            agg = sub.groupby("__day", sort=True).agg(
                n=("n", "sum"), sum_value=("sum_value", "sum"))
            lo, hi = int(agg.index.min()), int(agg.index.max())
            days = np.arange(lo, hi + 1, us_day, dtype=np.int64)
            full = agg.reindex(days, fill_value=0)
            out.append(pd.DataFrame({
                key: k,
                "day": pd.to_datetime(days, unit="us").strftime("%Y-%m-%d"),
                "n": full["n"].to_numpy().astype("int64"),
                "sum_value": round_half_away(
                    full["sum_value"].to_numpy().astype(np.float64), ndigits),
            }))
        return (pd.concat(out, ignore_index=True) if out
                else pd.DataFrame({key: [], "day": [], "n": [],
                                   "sum_value": []}))

    return (
        parts.map_batches(add_bucket_column([key], nbuckets),
                          batch_format="pyarrow")
        .repartition(blocks_for_keys(nbuckets))
        .groupby(BUCKET_COL)
        .map_groups(lambda g: reindex(g.drop(columns=[BUCKET_COL])),
                    batch_format="pandas")
    )


def cohort_retention(ds, key: str, ts_col: str, *, window_days: int = 7,
                     driver_limit: int = 5_000_000, nbuckets: int = 16):
    """Cohort retention: group every entity by its FIRST-event calendar
    day and count how many came back within ``window_days`` — the
    classic product-analytics rollup, here with exact microsecond
    semantics (retained iff some event has
    ``first_ts < ts <= first_ts + window`` — integer µs comparisons,
    no float arithmetic, so oracle parity is exact).

    Shape: (1) one combiner-first groupby → per-entity min timestamp;
    (2) the first-seen table applies back as a count-guarded driver
    broadcast (sorted id array + searchsorted) during a second
    streaming pass that emits per-block (entity, retained) partials —
    past ``driver_limit`` entities it becomes a bucketed hash join;
    (3) per-entity OR via groupby Max, then a tiny per-day rollup.
    Nothing event-sized ever shuffles: pass 2's shuffle carries one row
    per entity per block."""
    import ray
    from ray.data.aggregate import Max, Min, Sum

    us_window = int(window_days) * 86_400_000_000

    def first_partial(t: pa.Table) -> pa.Table:
        epoch = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        g = pa.table({key: t[key], "__us": epoch}) \
            .group_by([key]).aggregate([("__us", "min")])
        return g.rename_columns([key, "first_us"])

    firsts = (
        ds.map_batches(first_partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Min("first_us", alias_name="first_us"))
        .materialize()
    )

    def retained_partial(t: pa.Table, first_of) -> pa.Table:
        epoch = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                        pa.int64()).to_numpy(zero_copy_only=False)
        ks = t[key].to_numpy(zero_copy_only=False)
        f = first_of(ks)
        ret = ((epoch > f) & (epoch <= f + us_window)).astype(np.int64)
        g = pa.table({
            key: t[key],
            "first_us": pa.array(f, pa.int64()),
            "retained": pa.array(ret, pa.int64()),
        }).group_by([key, "first_us"]).aggregate([("retained", "max")])
        return g.rename_columns([key, "first_us", "retained"])

    n_entities = firsts.count()
    if n_entities <= driver_limit:
        from .dedup import collect_arrow

        ft = collect_arrow(firsts)
        ids = ft[key].to_numpy(zero_copy_only=False)
        fus = ft["first_us"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        bc = ray.put((ids[order], fus[order]))

        def part_bc(t: pa.Table) -> pa.Table:
            id_s, f_s = ray.get(bc)
            return retained_partial(
                t, lambda ks: f_s[np.searchsorted(id_s, ks)])

        parts = ds.map_batches(part_bc, batch_format="pyarrow")
    else:
        from .joins import bucketed_join

        j = bucketed_join(ds.select_columns([key, ts_col]), firsts,
                          on=[key])
        parts = j.map_batches(
            lambda t: retained_partial(
                t, lambda _ks, _f=t["first_us"].to_numpy(
                    zero_copy_only=False): _f),
            batch_format="pyarrow")

    per_entity = parts.groupby(key).aggregate(
        Min("first_us", alias_name="first_us"),
        Max("retained", alias_name="retained"),
    )

    def day_partial(t: pa.Table) -> pa.Table:
        us_day = 86_400_000_000
        f = t["first_us"].to_numpy(zero_copy_only=False)
        days = pd.to_datetime((f // us_day) * us_day,
                              unit="us").strftime("%Y-%m-%d")
        g = pa.table({
            "cohort_day": pa.array(days, pa.string()),
            "n_users": pa.array(np.ones(len(f), np.int64), pa.int64()),
            "n_retained": t["retained"],
        }).group_by(["cohort_day"]).aggregate(
            [("n_users", "sum"), ("n_retained", "sum")])
        return g.rename_columns(["cohort_day", "n_users", "n_retained"])

    return (
        per_entity.map_batches(day_partial, batch_format="pyarrow")
        .groupby("cohort_day")
        .aggregate(Sum("n_users", alias_name="n_users"),
                   Sum("n_retained", alias_name="n_retained"))
    )


def running_total(ds, key: str, ts_col: str, id_col: str,
                  value_col: str, ndigits: int = 6, nbuckets: int = 16):
    """Cumulative SUM window per key, ordered by (ts, id) — SQL
    ``SUM(value) OVER (PARTITION BY key ORDER BY ts, id ROWS UNBOUNDED
    PRECEDING)``. np.cumsum accumulates left-to-right in frame order —
    the same association a sequential window aggregator uses — with a
    per-key reset via first-row offsets.

    Output: key, id, running_total (float64, half-away rounded)."""
    from ..functions.num import round_half_away

    def fn(g: pd.DataFrame, first: np.ndarray) -> pd.DataFrame:
        # per-group SEQUENTIAL accumulation (pandas cumsum restarts at
        # each key and adds left-to-right) — a global-cumsum-minus-
        # offset formulation would change the float association and
        # diverge from the SQL window aggregator pre-rounding
        cs = (g[value_col].astype("float64")
              .groupby(g[key].to_numpy(), sort=False).cumsum()
              .to_numpy())
        return pd.DataFrame({
            key: g[key].to_numpy(),
            id_col: g[id_col].to_numpy(),
            "running_total": round_half_away(cs, ndigits),
        })

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({
            key: t[key],
            id_col: t[id_col],
            value_col: t[value_col],
            ts_col: pc.cast(pc.cast(t[ts_col], pa.int64()), pa.int64()),
        })

    return _per_key_rows(
        ds.map_batches(to_us, batch_format="pyarrow"),
        key, [ts_col, id_col], fn, nbuckets,
    )


def rank_window(ds, key: str, value_col: str, id_col: str,
                descending: bool = True, nbuckets: int = 16):
    """RANK() and DENSE_RANK() per key over ``value_col`` — SQL
    ``RANK() OVER (PARTITION BY key ORDER BY value [DESC])``. One
    bucketed shuffle; ranks are computed per key inside the bucket
    with pandas' C rank kernel (competition + dense methods).

    Output: key, id, value, rnk, drnk (int64)."""

    def fn(g: pd.DataFrame, first: np.ndarray) -> pd.DataFrame:
        grp = g.groupby(g[key].to_numpy(), sort=False)[value_col]
        return pd.DataFrame({
            key: g[key].to_numpy(),
            id_col: g[id_col].to_numpy(),
            value_col: g[value_col].to_numpy(),
            "rnk": grp.rank(method="min", ascending=not descending)
                      .astype("int64").to_numpy(),
            "drnk": grp.rank(method="dense", ascending=not descending)
                       .astype("int64").to_numpy(),
        })

    return _per_key_rows(ds, key, [id_col], fn, nbuckets)


def percent_rank_window(ds, key: str, value_col: str, id_col: str,
                        descending: bool = True, nbuckets: int = 16):
    """PERCENT_RANK() and CUME_DIST() per key over ``value_col`` — SQL
    ``PERCENT_RANK() OVER (PARTITION BY key ORDER BY value [DESC])``.
    Same one-shuffle shape as :func:`rank_window`; both statistics
    depend only on the VALUE distribution (never on tie order), so the
    result is deterministic under any block layout.

    Float parity with the SQL window engine is exact, not approximate:
    PERCENT_RANK = (rank-1)/(n-1) and CUME_DIST = rank_max/n are single
    IEEE divisions of the same two integers on both sides (n == 1 keys
    get PERCENT_RANK 0, the SQL definition).

    Output: key, id, pct_rnk (float64), cume (float64)."""

    def fn(g: pd.DataFrame, first: np.ndarray) -> pd.DataFrame:
        grp = g.groupby(g[key].to_numpy(), sort=False)[value_col]
        rmin = grp.rank(method="min", ascending=not descending).to_numpy()
        rmax = grp.rank(method="max", ascending=not descending).to_numpy()
        n = grp.transform("size").to_numpy().astype(np.float64)
        pct = np.where(n > 1.0, (rmin - 1.0) / np.maximum(n - 1.0, 1.0), 0.0)
        return pd.DataFrame({
            key: g[key].to_numpy(),
            id_col: g[id_col].to_numpy(),
            "pct_rnk": pct,
            "cume": rmax / n,
        })

    return _per_key_rows(ds, key, [id_col], fn, nbuckets)


def lead_gap(ds, key: str, ts_col: str, id_col: str, nbuckets: int = 16):
    """LEAD window: per-key time gap (µs) to the NEXT event, ordered by
    (ts, id) — the forward twin of ``lag_gap``. The last event of a key
    gets -1 (the NULL sentinel; engine and oracle coalesce
    identically).

    Output: key, id, lead_us (int64)."""

    def fn(g: pd.DataFrame, first: np.ndarray) -> pd.DataFrame:
        ts = g[ts_col].astype("int64").to_numpy()
        lead = np.empty(len(g), dtype=np.int64)
        lead[-1:] = -1
        lead[:-1] = ts[1:] - ts[:-1]
        # last row of each key = the row BEFORE each key's first row
        last = np.empty(len(g), dtype=bool)
        last[:-1] = first[1:]
        last[-1:] = True
        lead[last] = -1
        return pd.DataFrame({
            key: g[key].to_numpy(),
            id_col: g[id_col].to_numpy(),
            "lead_us": lead,
        })

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({
            key: t[key],
            id_col: t[id_col],
            ts_col: pc.cast(pc.cast(t[ts_col], pa.int64()), pa.int64()),
        })

    return _per_key_rows(
        ds.map_batches(to_us, batch_format="pyarrow"),
        key, [ts_col, id_col], fn, nbuckets,
    )
