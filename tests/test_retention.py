"""cohort_retention: exact first-seen window semantics + path
equivalence (broadcast vs bucketed-join)."""

import pandas as pd

from hikma_engine_ray.stages.windows import cohort_retention


def _events():
    # u1: first 2024-01-01, returns day 3 -> retained (7d)
    # u2: first 2024-01-01, returns day 20 -> NOT retained
    # u3: first 2024-01-02, single event -> NOT retained
    # u4: first 2024-01-02, returns exactly +7d boundary -> retained
    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-03 09:00:00"),
        (2, "2024-01-01 12:00:00"), (2, "2024-01-20 12:00:00"),
        (3, "2024-01-02 08:00:00"),
        (4, "2024-01-02 06:00:00"), (4, "2024-01-09 06:00:00"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    df["ts"] = pd.to_datetime(df["ts"])
    return df


def _run(ds, **kw):
    return (cohort_retention(ds, "user_id", "ts", window_days=7, **kw)
            .to_pandas().sort_values("cohort_day").reset_index(drop=True))


def test_retention_windows(ray_session):
    import ray.data as rd

    got = _run(rd.from_pandas(_events()).repartition(3))
    assert got["cohort_day"].tolist() == ["2024-01-01", "2024-01-02"]
    assert got["n_users"].tolist() == [2, 2]
    # u1 retained; u2 not; u4 boundary ts == first+7d counts (<=); u3 not
    assert got["n_retained"].tolist() == [1, 1]


def test_retention_paths_equivalent(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(_events()).repartition(3)
    pd.testing.assert_frame_equal(_run(ds), _run(ds, driver_limit=0))


def test_running_total_resets_per_key(ray_session):
    import numpy as np
    import ray.data as rd

    from hikma_engine_ray.stages.windows import running_total

    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2],
        "ts": pd.to_datetime([
            "2024-01-01", "2024-01-02", "2024-01-03",
            "2024-01-01", "2024-01-05"]),
        "event_id": [10, 11, 12, 20, 21],
        "value": [1.5, 2.0, -0.5, 4.0, 1.0],
    })
    got = (running_total(rd.from_pandas(df).repartition(2),
                         "user_id", "ts", "event_id", "value")
           .to_pandas().sort_values("event_id"))
    assert got["running_total"].tolist() == [1.5, 3.5, 3.0, 4.0, 5.0]
