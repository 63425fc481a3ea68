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
