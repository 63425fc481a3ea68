"""global_row_number: exact ROW_NUMBER/NTILE vs a pandas reference,
layout- and boundary-invariant, both directions, heavy ties, empty."""

import numpy as np
import pandas as pd
import pytest

from hikma_engine_ray.stages.agg import global_row_number


def _want(df, value_col, id_col, descending, n_tiles):
    w = df.sort_values([value_col, id_col],
                       ascending=[not descending, True], kind="stable")
    w = w.reset_index(drop=True)
    rn = np.arange(1, len(w) + 1)
    out = pd.DataFrame({id_col: w[id_col].to_numpy(),
                        value_col: w[value_col].to_numpy(), "rn": rn})
    if n_tiles:
        total = len(w)
        q, r = divmod(total, n_tiles)
        cut = r * (q + 1)
        k = rn - 1
        out["tile"] = np.where(k < cut, k // max(q + 1, 1) + 1,
                               r + (k - cut) // max(q, 1) + 1).astype("int64")
    return out


@pytest.mark.parametrize("descending", [False, True])
@pytest.mark.parametrize("nblocks", [1, 7])
def test_rownumber_matches_pandas(ray_session, descending, nblocks):
    import ray.data as rd

    rng = np.random.default_rng(17)
    # heavy ties: values drawn from 10 distinct floats
    df = pd.DataFrame({
        "v": rng.choice(np.round(rng.uniform(0, 100, 10), 2), 500),
        "id": rng.permutation(500).astype("int64"),
    })
    got = (
        global_row_number(rd.from_pandas(df).repartition(nblocks),
                          "v", "id", descending=descending, n_tiles=7,
                          nbuckets=9)
        .to_pandas().sort_values("rn").reset_index(drop=True)
    )
    want = _want(df, "v", "id", descending, 7)
    pd.testing.assert_frame_equal(
        got[["id", "v", "rn", "tile"]], want[["id", "v", "rn", "tile"]]
    )


def test_rownumber_strings_and_small_buckets(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"v": list("bacbacbacd"),
                       "id": np.arange(10, dtype="int64")})
    got = (
        global_row_number(rd.from_pandas(df), "v", "id", nbuckets=3)
        .to_pandas().sort_values("rn").reset_index(drop=True)
    )
    want = _want(df, "v", "id", False, None)
    pd.testing.assert_frame_equal(got[["id", "v", "rn"]],
                                  want[["id", "v", "rn"]])


def test_rownumber_ntile_fewer_rows_than_tiles(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"v": [3.0, 1.0], "id": np.array([1, 2], "int64")})
    got = (global_row_number(rd.from_pandas(df), "v", "id", n_tiles=5)
           .to_pandas().sort_values("rn").reset_index(drop=True))
    assert got["tile"].tolist() == [1, 2]
    assert got["v"].tolist() == [1.0, 3.0]


def test_rank_window_ties_and_dense(ray_session):
    """RANK leaves gaps after ties; DENSE_RANK doesn't; per-key reset."""
    import pandas as pd
    import ray.data as rd

    from hikma_engine_ray.stages.windows import rank_window

    df = pd.DataFrame({
        "k": ["a", "a", "a", "a", "b", "b"],
        "id": [1, 2, 3, 4, 5, 6],
        "v": [10.0, 10.0, 7.0, 5.0, 3.0, 9.0],
    })
    out = rank_window(rd.from_pandas(df).repartition(3), "k", "v", "id",
                      nbuckets=4).to_pandas().sort_values("id")
    assert out["rnk"].tolist() == [1, 1, 3, 4, 2, 1]
    assert out["drnk"].tolist() == [1, 1, 2, 3, 2, 1]


def test_rank_and_lead_match_serial_reference_random(ray_session):
    """Block-layout invariance on a random frame: rank_window and
    lead_gap through the bucketed shuffle must equal the direct serial
    pandas computation (fixed seed, several repartition layouts)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hikma_engine_ray.stages.windows import lead_gap, rank_window

    rng = np.random.RandomState(7)
    n = 400
    df = pd.DataFrame({
        "k": rng.choice(list("abcdefg"), n),
        "id": np.arange(n, dtype=np.int64),
        "v": rng.randint(0, 12, n).astype("float64"),  # many ties
        "ts": rng.randint(0, 10**6, n).astype("int64"),
    })
    srt = df.sort_values(["k", "id"], kind="stable")
    grp = srt.groupby("k", sort=False)
    want_rnk = grp["v"].rank(method="min", ascending=False).astype("int64")
    want_drnk = grp["v"].rank(method="dense", ascending=False).astype("int64")
    ref_rank = dict(zip(srt["id"], zip(want_rnk, want_drnk)))

    srt2 = df.sort_values(["k", "ts", "id"], kind="stable")
    lead = srt2.groupby("k", sort=False)["ts"].shift(-1) - srt2["ts"]
    ref_lead = dict(zip(srt2["id"], lead.fillna(-1).astype("int64")))

    for nparts in (1, 3, 8):
        ds = rd.from_pandas(df).repartition(nparts)
        got = rank_window(ds, "k", "v", "id", nbuckets=4).to_pandas()
        assert {r["id"]: (r["rnk"], r["drnk"])
                for _, r in got.iterrows()} == ref_rank
        got_l = lead_gap(ds, "k", "ts", "id", nbuckets=4).to_pandas()
        assert {r["id"]: r["lead_us"]
                for _, r in got_l.iterrows()} == ref_lead


def test_percent_rank_window_matches_serial_reference(ray_session):
    """percent_rank_window vs the direct serial pandas computation:
    PERCENT_RANK = (rank_min-1)/(n-1) (0 for singleton keys) and
    CUME_DIST = rank_max/n, layout-invariant, many ties."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hikma_engine_ray.stages.windows import percent_rank_window

    rng = np.random.RandomState(11)
    n = 300
    df = pd.DataFrame({
        "k": rng.choice(list("abcde"), n),
        "id": np.arange(n, dtype=np.int64),
        "v": rng.randint(0, 9, n).astype("float64"),
    })
    # one singleton key exercising the n == 1 -> 0.0 definition
    df.loc[len(df)] = ["z", n, 5.0]
    df["id"] = df["id"].astype("int64")

    grp = df.groupby("k", sort=False)["v"]
    rmin = grp.rank(method="min", ascending=False).to_numpy()
    rmax = grp.rank(method="max", ascending=False).to_numpy()
    cnt = grp.transform("size").to_numpy().astype("float64")
    pct = np.where(cnt > 1, (rmin - 1.0) / np.maximum(cnt - 1.0, 1.0), 0.0)
    ref = {i: (p, c) for i, p, c in zip(df["id"], pct, rmax / cnt)}

    for nparts in (1, 4):
        got = percent_rank_window(
            rd.from_pandas(df).repartition(nparts), "k", "v", "id",
            nbuckets=4).to_pandas()
        assert len(got) == len(df)
        for _, r in got.iterrows():
            wp, wc = ref[r["id"]]
            assert r["pct_rnk"] == wp and r["cume"] == wc
    singleton = got[got["k"] == "z"]
    assert singleton["pct_rnk"].tolist() == [0.0]
    assert singleton["cume"].tolist() == [1.0]
