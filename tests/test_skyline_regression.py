"""Skyline (Pareto frontier) vs brute-force dominance; grouped OLS vs
numpy polyfit — layout-invariant."""

import numpy as np
import pandas as pd
import pytest

from hikma_engine_ray.stages.agg import grouped_regression
from hikma_engine_ray.stages.skyline import _local_skyline_idx, skyline


def _brute_skyline(m):
    keep = []
    for i in range(len(m)):
        dominated = False
        for j in range(len(m)):
            if i == j:
                continue
            if (m[j] >= m[i]).all() and (m[j] > m[i]).any():
                dominated = True
                break
        if not dominated:
            keep.append(i)
    return sorted(keep)


def test_local_skyline_matches_brute():
    rng = np.random.default_rng(7)
    for d in (2, 3):
        m = rng.integers(0, 12, (120, d)).astype(float)
        got = _local_skyline_idx(m).tolist()
        assert got == _brute_skyline(m)


@pytest.mark.parametrize("nblocks", [1, 6])
def test_skyline_dataset_matches_brute(ray_session, nblocks):
    import ray.data as rd

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "id": np.arange(300, dtype="int64"),
        "x": rng.integers(0, 25, 300).astype("int64"),
        "y": np.round(rng.uniform(0, 10, 300), 2),
    })
    got = (skyline(rd.from_pandas(df).repartition(nblocks), ["x", "y"])
           .to_pandas().sort_values("id").reset_index(drop=True))
    m = df[["x", "y"]].to_numpy(dtype=float)
    want = df.iloc[_brute_skyline(m)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert 0 < len(want) < len(df)


def test_skyline_minimize_and_duplicates(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "id": np.arange(6, dtype="int64"),
        "x": [1, 1, 5, 5, 3, 0],
        "y": [9, 9, 2, 2, 5, 10],
    })
    # maximize x, minimize y: frontier = lowest-y-per-higher-x tradeoff
    got = (skyline(rd.from_pandas(df), ["x", "y"], [True, False])
           .to_pandas().sort_values("id"))
    m = np.column_stack([df["x"], -df["y"]]).astype(float)
    want_ids = df.iloc[_brute_skyline(m)]["id"].tolist()
    assert got["id"].tolist() == want_ids
    # duplicated frontier points both survive
    assert (got["id"] < 2).sum() in (0, 2)


@pytest.mark.parametrize("nblocks", [1, 5])
def test_grouped_regression_matches_numpy(ray_session, nblocks):
    import ray.data as rd

    rng = np.random.default_rng(23)
    n = 400
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], n),
        "x": rng.uniform(0, 10, n),
    })
    df["y"] = 3.0 * df["x"] + rng.normal(0, 1, n) + (df["g"] == "b") * 5

    got = (grouped_regression(rd.from_pandas(df).repartition(nblocks),
                              ["g"], "x", "y")
           .to_pandas().sort_values("g").reset_index(drop=True))
    for _, row in got.iterrows():
        sub = df[df["g"] == row["g"]]
        slope, intercept = np.polyfit(sub["x"], sub["y"], 1)
        r = np.corrcoef(sub["x"], sub["y"])[0, 1]
        assert abs(row["slope"] - slope) < 1e-4
        assert abs(row["intercept"] - intercept) < 1e-4
        assert abs(row["r2"] - r * r) < 1e-4
        assert row["n"] == len(sub)
