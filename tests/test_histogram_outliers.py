"""grouped_histogram (equi-width, global bounds) and quantile_outliers
(per-group discrete-quantile band flagging)."""

import numpy as np
import pandas as pd

from hikma_engine_ray.stages.agg import grouped_histogram, quantile_outliers


def test_grouped_histogram_values(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "g": ["a"] * 4 + ["b"] * 4,
        "x": [0.0, 1.0, 2.0, 4.0, 0.0, 4.0, 4.0, 3.0],
    })
    got = grouped_histogram(rd.from_pandas(df).repartition(3), "g", "x",
                            bins=4).to_pandas()
    got = got.set_index(["g", "bin"])["n"].to_dict()
    # bounds [0, 4], width 1; x == 4 clamps into bin 3
    assert got == {("a", 0): 1, ("a", 1): 1, ("a", 2): 1, ("a", 3): 1,
                   ("b", 0): 1, ("b", 3): 3}


def test_grouped_histogram_degenerate(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"g": ["a", "a", "b"], "x": [2.0, 2.0, 2.0]})
    got = grouped_histogram(rd.from_pandas(df), "g", "x",
                            bins=8).to_pandas()
    assert got["bin"].tolist() == [0, 0]
    assert got["n"].sum() == 3


def test_grouped_histogram_empty_and_nulls(ray_session):
    """Empty input returns an empty histogram (no float(None) crash);
    NULL values are dropped before binning, not emitted as garbage
    bins (round-4 ADVICE)."""
    import pyarrow as pa
    import ray.data as rd

    empty = rd.from_arrow(pa.table({"g": pa.array([], pa.string()),
                                    "x": pa.array([], pa.float64())}))
    out = grouped_histogram(empty, "g", "x", bins=4)
    assert out.count() == 0
    assert out.schema().names == ["g", "bin", "n"]

    withnulls = rd.from_arrow(pa.table({
        "g": pa.array(["a", "a", "b", "b"], pa.string()),
        "x": pa.array([1.0, None, 3.0, None], pa.float64()),
    })).repartition(2)
    got = grouped_histogram(withnulls, "g", "x", bins=2).to_pandas()
    got = got.set_index(["g", "bin"])["n"].to_dict()
    # bounds [1, 3], width 1: only the two non-null rows appear
    assert got == {("a", 0): 1, ("b", 1): 1}

    allnull = rd.from_arrow(pa.table({
        "g": pa.array(["a"], pa.string()),
        "x": pa.array([None], pa.float64()),
    }))
    assert len(grouped_histogram(allnull, "g", "x", bins=4).to_pandas()) == 0


def test_quantile_outliers_band(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    vals = rng.normal(size=40).round(3)
    df = pd.DataFrame({
        "k": ["u"] * 40, "id": np.arange(40), "v": vals,
    })
    ds = rd.from_pandas(df).repartition(4)
    got = quantile_outliers(ds, "k", "v", "id", lo=0.10, hi=0.90)
    got = got.to_pandas().sort_values("id")
    # serial oracle: quantile_disc = value at 1-based ceil(q*n)
    sv = np.sort(vals)
    lo, hi = sv[int(np.ceil(0.10 * 40)) - 1], sv[int(np.ceil(0.90 * 40)) - 1]
    exp = df[(df.v < lo) | (df.v > hi)]
    assert got["id"].tolist() == exp["id"].tolist()
    assert set(got["side"]) == {"low", "high"}
    # both decision paths agree
    slow = quantile_outliers(ds, "k", "v", "id", lo=0.10, hi=0.90,
                             driver_limit=0).to_pandas().sort_values("id")
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  slow.reset_index(drop=True))
