"""Exact grouped quantiles / Pearson corr / grouped top-k
(stages/agg.py extensions) vs in-process references, including the
distribution-across-blocks property the combiners must survive."""

import numpy as np
import pandas as pd
import pytest

from hikma_engine_ray.stages.agg import grouped_corr, grouped_quantiles, grouped_topk


def _df():
    rng = np.random.RandomState(3)
    n = 5000
    return pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], size=n),
        "v": rng.randint(1, 51, size=n).astype(float),
        "w": rng.normal(size=n) * 10 + 5,
    })


def _quantile_disc(vals: np.ndarray, q: float):
    s = np.sort(vals)
    idx = int(np.ceil(np.round(q * len(s), 9)))
    return s[max(idx, 1) - 1]


def test_grouped_quantiles_exact(ray_session):
    import ray.data as rd

    df = _df()
    got = {
        r["g"]: (r["q50"], r["q90"])
        for r in grouped_quantiles(
            rd.from_pandas(df).repartition(13), ["g"], "v", [0.5, 0.9]
        ).take_all()
    }
    for g, sub in df.groupby("g"):
        assert got[g] == (
            _quantile_disc(sub["v"].to_numpy(), 0.5),
            _quantile_disc(sub["v"].to_numpy(), 0.9),
        )


def test_grouped_quantiles_vs_duckdb_semantics(ray_session):
    """Same element DuckDB's quantile_disc picks, across group sizes
    that hit the ceil boundary cases."""
    import duckdb
    import ray.data as rd

    df = pd.DataFrame({
        "g": ["x"] * 4 + ["y"] * 5 + ["z"] * 10,
        "v": [1.0, 2, 3, 4] + [1.0, 2, 3, 4, 5] + list(map(float, range(1, 11))),
    })
    got = {
        r["g"]: (r["q25"], r["q90"])
        for r in grouped_quantiles(rd.from_pandas(df), ["g"], "v", [0.25, 0.9]).take_all()
    }
    want = {
        g: (a, b)
        for g, a, b in duckdb.sql(
            "SELECT g, quantile_disc(v, 0.25), quantile_disc(v, 0.9) "
            "FROM df GROUP BY g"
        ).fetchall()
    }
    assert got == want


def test_grouped_corr_matches_pandas(ray_session):
    import ray.data as rd

    df = _df()
    got = {
        r["g"]: r["corr"]
        for r in grouped_corr(
            rd.from_pandas(df).repartition(17), ["g"], "v", "w"
        ).take_all()
    }
    for g, sub in df.groupby("g"):
        assert got[g] == pytest.approx(sub["v"].corr(sub["w"]), rel=1e-9)


def test_grouped_corr_degenerate_group(ray_session):
    """Zero-variance group → NaN (SQL corr returns NULL there)."""
    import ray.data as rd

    df = pd.DataFrame({"g": ["k"] * 4, "v": [2.0] * 4, "w": [1.0, 2, 3, 4]})
    [row] = grouped_corr(rd.from_pandas(df), ["g"], "v", "w").take_all()
    assert np.isnan(row["corr"])


def test_grouped_topk(ray_session):
    import ray.data as rd

    df = _df().assign(rid=np.arange(5000))
    got = grouped_topk(
        rd.from_pandas(df).repartition(11), ["g"], "w", 5,
        descending=True, tiebreak=["rid"],
    ).take_all()
    want = (
        df.sort_values(["w", "rid"], ascending=[False, True], kind="stable")
        .groupby("g", sort=False)
        .head(5)
    )
    wset = set(map(tuple, want[["g", "rid"]].itertuples(index=False)))
    assert {(r["g"], r["rid"]) for r in got} == wset
    assert len(got) == 15


def test_grouped_topk_ties_deterministic(ray_session):
    """Equal sort values resolve by the tiebreak column, not arrival
    order."""
    import ray.data as rd

    df = pd.DataFrame({"g": ["a"] * 6, "s": [9.0] * 6, "id": [5, 3, 1, 4, 2, 0]})
    got = grouped_topk(
        rd.from_pandas(df).repartition(3), ["g"], "s", 3, tiebreak=["id"]
    ).take_all()
    assert sorted(r["id"] for r in got) == [0, 1, 2]


def test_global_topk_matches_full_sort(ray_session):
    """global_topk ≡ ORDER BY … LIMIT k, including descending mixes and
    ties broken by the secondary column, across block layouts."""
    import numpy as np
    import ray.data as rd

    from hikma_engine_ray.stages.agg import global_topk

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "v": rng.integers(0, 50, 500).astype("int64"),  # many ties
        "id": np.arange(500, dtype="int64"),
    })
    for nblocks in (1, 7):
        got = global_topk(
            rd.from_pandas(df).repartition(nblocks),
            ["v", "id"], 12, descending=[True, False],
        ).to_pandas()
        want = (
            df.sort_values(["v", "id"], ascending=[False, True])
            .head(12).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
    # ascending variant
    got = global_topk(
        rd.from_pandas(df).repartition(5), ["v", "id"], 8, descending=False
    ).to_pandas()
    want = df.sort_values(["v", "id"]).head(8).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
