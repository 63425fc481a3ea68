"""Round-4 operator kernels vs serial references: row windows
(lag_gap, moving_avg), distribution stats (string_agg, entropy, chi2,
MAD), and tf-idf salient terms. Every test also varies the block
layout — results must be layout-invariant."""

import numpy as np
import pandas as pd
import pytest


def _events(n=400, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "user_id": rng.integers(0, 12, n).astype("int64"),
        "event_id": np.arange(n, dtype="int64"),
        "ts": rng.integers(0, 10_000_000, n).astype("int64"),
        "value": np.round(rng.uniform(0, 100, n), 3),
    })


def test_lag_gap_matches_pandas(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.windows import lag_gap

    df = _events()
    for nblocks in (1, 5):
        got = (
            lag_gap(rd.from_pandas(df).repartition(nblocks),
                    "user_id", "ts", "event_id")
            .to_pandas()
            .sort_values(["user_id", "event_id"])
            .reset_index(drop=True)
        )
        want = df.sort_values(["user_id", "ts", "event_id"]).copy()
        want["gap_us"] = (
            want.groupby("user_id")["ts"].diff().fillna(-1).astype("int64")
        )
        want = (want[["user_id", "event_id", "gap_us"]]
                .sort_values(["user_id", "event_id"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)


def test_moving_avg_matches_pandas(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.windows import moving_avg

    df = _events(seed=5)
    got = (
        moving_avg(rd.from_pandas(df).repartition(4),
                   "user_id", "ts", "event_id", "value", window=3)
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    want = df.sort_values(["user_id", "ts", "event_id"]).copy()
    want["mov_avg"] = (
        want.groupby("user_id")["value"]
        .rolling(3, min_periods=1).mean()
        .reset_index(level=0, drop=True)
    )
    want = (want[["user_id", "event_id", "mov_avg"]]
            .sort_values(["user_id", "event_id"]).reset_index(drop=True))
    assert np.allclose(got["mov_avg"], want["mov_avg"], atol=1e-4)
    assert (got["user_id"] == want["user_id"]).all()


def test_grouped_string_agg(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.agg import grouped_string_agg

    df = pd.DataFrame({
        "g": ["a", "a", "b", "b", "a", "b"],
        "v": ["z", "m", "q", "q", "z", "a"],
    })
    got = (
        grouped_string_agg(rd.from_pandas(df).repartition(3), "g", "v")
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    want = pd.DataFrame({"g": ["a", "b"], "agg": ["m,z", "a,q"]})
    pd.testing.assert_frame_equal(got, want)


def test_grouped_entropy_matches_manual(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.agg import grouped_entropy

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "g": rng.choice(["x", "y"], 300),
        "v": rng.choice(list("abcde"), 300, p=[0.5, 0.2, 0.15, 0.1, 0.05]),
    })
    got = (
        grouped_entropy(rd.from_pandas(df).repartition(4), "g", "v")
        .to_pandas().set_index("g")["entropy"]
    )
    for g, sub in df.groupby("g"):
        p = sub["v"].value_counts(normalize=True).to_numpy()
        h = float(-(p * np.log2(p)).sum())
        assert abs(got[g] - h) < 1e-5


def test_chi2_matches_manual(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.agg import chi2_independence

    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "a": rng.choice(["p", "q", "r"], 500),
        "b": rng.choice(["u", "v"], 500),
    })
    got = chi2_independence(rd.from_pandas(df).repartition(3), "a", "b")
    obs = pd.crosstab(df["a"], df["b"]).to_numpy(dtype=float)
    exp = obs.sum(1, keepdims=True) @ obs.sum(0, keepdims=True) / obs.sum()
    chi2 = ((obs - exp) ** 2 / exp).sum()
    assert abs(got["chi2"].iloc[0] - chi2) < 1e-3
    assert got["dof"].iloc[0] == 2


def test_grouped_mad_matches_manual(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.agg import grouped_mad

    rng = np.random.default_rng(17)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 400),
        "v": rng.integers(1, 50, 400).astype("int64"),
    })
    got = (
        grouped_mad(rd.from_pandas(df).repartition(4), ["g"], "v")
        .to_pandas().set_index("g")["mad"]
    )

    def disc_median(x):  # quantile_disc: element at ceil(0.5*n), 1-based
        s = np.sort(np.asarray(x))
        return s[int(np.ceil(0.5 * len(s))) - 1]

    for g, sub in df.groupby("g"):
        m = disc_median(sub["v"])
        mad = disc_median(np.round(np.abs(sub["v"] - m), 9))
        assert got[g] == pytest.approx(mad, abs=1e-4)


def test_tfidf_topk_matches_manual(ray_session):
    import math

    import ray.data as rd

    from hikma_engine_ray.stages.relevance import tfidf_topk

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype="int64"),
        "text": [
            "apple banana apple cherry",
            "banana cherry cherry dates",
            "apple apple apple eel",
            "dates eel fig fig fig",
            "",
            "fig apple banana",
        ],
    })
    for nblocks in (1, 3):
        got = (
            tfidf_topk(rd.from_pandas(docs).repartition(nblocks), per_doc_k=2)
            .to_pandas()
            .sort_values(["doc_id", "score", "token"],
                         ascending=[True, False, True])
            .reset_index(drop=True)
        )
        # manual reference
        tokd = {r.doc_id: r.text.split() for r in docs.itertuples()
                if r.text}
        n = len(docs)
        df_counts: dict = {}
        for toks in tokd.values():
            for t in set(toks):
                df_counts[t] = df_counts.get(t, 0) + 1
        rows = []
        for d, toks in tokd.items():
            scores = [
                (round(toks.count(t) * math.log(n / df_counts[t]), 6), t)
                for t in set(toks)
            ]
            scores.sort(key=lambda st: (-st[0], st[1]))
            rows += [(d, t, s) for s, t in scores[:2]]
        want = (pd.DataFrame(rows, columns=["doc_id", "token", "score"])
                .sort_values(["doc_id", "score", "token"],
                             ascending=[True, False, True])
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["doc_id", "token", "score"]], want, check_dtype=False
        )


def test_chunk_documents_windows(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.text import chunk_documents

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            " ".join(f"t{i}" for i in range(10)),   # 10 toks → 1 chunk @8/2
            " ".join(f"t{i}" for i in range(8)),    # exactly one window
            "",                                     # no chunks
            " ".join(f"t{i}" for i in range(20)),   # 3 chunks (stride 6)
        ],
    })
    got = (
        chunk_documents(rd.from_pandas(docs).repartition(2),
                        chunk_tokens=8, overlap=2)
        .to_pandas().sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    # doc 0 (10 toks): windows at 0 (8 toks) and 6 (4 toks)
    d0 = got[got.doc_id == 0]
    assert list(d0.n_tokens) == [8, 4]
    assert d0.iloc[1].chunk_text == "t6 t7 t8 t9"
    # overlap: last 2 tokens of window 0 open window 1
    assert d0.iloc[0].chunk_text.split()[-2:] == d0.iloc[1].chunk_text.split()[:2]
    assert list(got[got.doc_id == 1].n_tokens) == [8]
    assert (got.doc_id != 2).all()
    assert list(got[got.doc_id == 3].n_tokens) == [8, 8, 8]
    # token conservation: every source token appears in some chunk
    covered = set()
    for r in got[got.doc_id == 3].itertuples():
        covered |= set(r.chunk_text.split())
    assert covered == {f"t{i}" for i in range(20)}


def test_repetition_stats_values(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.text import repetition_stats

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [
            "a b a b a b",        # 6 toks, 2 distinct; modal bigram "a b" ×3
            "x y z",              # all distinct
            "",
        ],
    })
    got = (repetition_stats(rd.from_pandas(docs))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got.loc[0, "dup_token_frac"] == pytest.approx(1 - 2 / 6)
    assert got.loc[0, "top_bigram_frac"] == pytest.approx(1.0)
    assert got.loc[1, "dup_token_frac"] == 0.0
    assert got.loc[1, "top_bigram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert got.loc[2, "n_tokens"] == 0
    assert got.loc[2, "dup_token_frac"] == 0.0


def test_mix_weights_uniform_target(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.text import mix_weights

    df = pd.DataFrame({"g": ["a"] * 60 + ["b"] * 30 + ["c"] * 10})
    got = mix_weights(rd.from_pandas(df).repartition(3), "g",
                      {"a": 1.0, "b": 1.0, "c": 1.0}).set_index("g")
    # rarest group keeps everything; others down-sample proportionally
    assert got.loc["c", "sample_rate"] == pytest.approx(1.0)
    assert got.loc["b", "sample_rate"] == pytest.approx(1 / 3, abs=1e-6)
    assert got.loc["a", "sample_rate"] == pytest.approx(1 / 6, abs=1e-6)
    assert got["observed_frac"].sum() == pytest.approx(1.0)


def test_distinct_set_op_all_ops(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.dedup import distinct_set_op

    a = pd.DataFrame({"k": [1, 2, 2, 3, 4, 4]})
    b = pd.DataFrame({"k": [3, 4, 5, 5]})
    la, rb = rd.from_pandas(a).repartition(3), rd.from_pandas(b).repartition(2)

    def run(op, **kw):
        return sorted(
            distinct_set_op(la, rb, ["k"], op, **kw)
            .to_pandas()["k"].tolist()
        )

    for kw in ({}, {"driver_limit": 0}):  # driver and shuffle paths
        assert run("intersect", **kw) == [3, 4]
        assert run("except", **kw) == [1, 2]
        assert run("union", **kw) == [1, 2, 3, 4, 5]
    with pytest.raises(ValueError):
        distinct_set_op(la, rb, ["k"], "xor")


def test_multiset_set_op(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.dedup import multiset_set_op

    # multiplicities: left {1:1, 2:3, 3:1, 4:2}; right {2:1, 3:2, 5:1}
    a = pd.DataFrame({"k": [1, 2, 2, 2, 3, 4, 4]})
    b = pd.DataFrame({"k": [2, 3, 3, 5]})
    la, rb = rd.from_pandas(a).repartition(3), rd.from_pandas(b).repartition(2)

    def run(op, **kw):
        df = multiset_set_op(la, rb, ["k"], op, **kw).to_pandas()
        return dict(zip(df["k"].tolist(), df["mult"].tolist()))

    for kw in ({}, {"driver_limit": 0}):  # driver and shuffle paths
        # INTERSECT ALL: min(l, r) where both > 0
        assert run("intersect_all", **kw) == {2: 1, 3: 1}
        # EXCEPT ALL: max(l - r, 0) where > 0
        assert run("except_all", **kw) == {1: 1, 2: 2, 4: 2}
    with pytest.raises(ValueError):
        multiset_set_op(la, rb, ["k"], "union_all")


def test_multiset_set_op_null_keys(ray_session):
    """SQL set ops treat NULL keys as equal regular values; rows whose
    first key is NULL must keep their multiplicity (round-4 ADVICE:
    count(col) skipped them)."""
    import ray.data as rd

    from hikma_engine_ray.stages.dedup import multiset_set_op

    import pyarrow as pa

    # left {None:2, 1:1}; right {None:1, 2:1} — typed arrow inputs:
    # pandas-backed blocks re-infer an all-None split as null type
    a = pa.table({"k": pa.array([None, None, 1.0], pa.float64())})
    b = pa.table({"k": pa.array([None, 2.0], pa.float64())})
    la, rb = rd.from_arrow(a).repartition(2), rd.from_arrow(b)

    def run(op):
        df = multiset_set_op(la, rb, ["k"], op).to_pandas()
        return {("∅" if pd.isna(k) else k): m
                for k, m in zip(df["k"], df["mult"])}

    # INTERSECT ALL: min(2, 1) = 1 for the NULL key
    assert run("intersect_all") == {"∅": 1}
    # EXCEPT ALL: NULL 2-1=1, key 1.0 1-0=1
    assert run("except_all") == {"∅": 1, 1.0: 1}


def test_funnel_ordered_prefix(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.windows import funnel

    # u1: full ordered funnel; u2: click before view (stops at view);
    # u3: view only; u4: purchase before click (stops at click)
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3, 4, 4, 4],
        "ts":      [10, 20, 30, 20, 10, 5, 10, 30, 20],
        "event_type": ["view", "click", "purchase",
                       "view", "click",
                       "view",
                       "view", "click", "purchase"],
    })
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    got = funnel(rd.from_pandas(df).repartition(3), "user_id", "ts",
                 "event_type", ["view", "click", "purchase"])
    row = got.iloc[0]
    assert row["n_keys"] == 4
    assert row["n_view"] == 4
    assert row["n_click"] == 2      # u1, u4
    assert row["n_purchase"] == 1   # u1 only (u4's purchase < click)


def test_containment_catches_excerpts_jaccard_misses(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.setsim import containment_self_join
    from hikma_engine_ray.stages.dedup_suite import _shingles, jaccard

    base = " ".join(f"w{i}" for i in range(12))           # 12 tokens
    big = base + " " + " ".join(f"x{i}" for i in range(60))  # base ⊂ big
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [base, big, "completely different tokens only here now"],
    })
    # sanity: the excerpt relation is invisible to Jaccard at t=0.8
    sa, sb = _shingles(base, 5), _shingles(big, 5)
    assert len(sa & sb) / len(sa) == 1.0 and jaccard(sa, sb) < 0.2

    for nblocks in (1, 3):
        got = (
            containment_self_join(
                rd.from_pandas(docs).repartition(nblocks), threshold=0.8, k=5)
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        )
        # exactly the directed pair 0 → 1 (base contained in big)
        assert list(map(tuple, got[["a", "b"]].itertuples(index=False))) == [(0, 1)]
        assert got["containment"].iloc[0] == 1.0


def test_resample_daily_matches_pandas(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.windows import resample_daily

    rng = np.random.default_rng(31)
    n = 300
    df = pd.DataFrame({
        "user_id": rng.integers(0, 6, n).astype("int64"),
        "ts": pd.to_datetime(
            rng.integers(0, 40, n) * 86_400_000_000
            + rng.integers(0, 86_400_000_000, n), unit="us"),
        "value": np.round(rng.uniform(0, 50, n), 3),
    })
    # sparse users: drop some whole days to create gaps
    df = df[~df["ts"].dt.day.isin([3, 4, 11])].reset_index(drop=True)

    def want_df():
        d = df.copy()
        d["day"] = d["ts"].dt.strftime("%Y-%m-%d")
        agg = d.groupby(["user_id", "day"]).agg(
            n=("value", "size"), sum_value=("value", "sum")).reset_index()
        outs = []
        for u, sub in agg.groupby("user_id"):
            days = pd.date_range(sub["day"].min(), sub["day"].max(),
                                 freq="D").strftime("%Y-%m-%d")
            full = sub.set_index("day").reindex(days, fill_value=0)
            outs.append(pd.DataFrame({
                "user_id": np.int64(u), "day": days,
                "n": full["n"].to_numpy().astype("int64"),
                "sum_value": np.round(
                    full["sum_value"].to_numpy().astype(float), 6),
            }))
        return (pd.concat(outs, ignore_index=True)
                .sort_values(["user_id", "day"]).reset_index(drop=True))

    want = want_df()
    for nblocks in (1, 5):
        got = (
            resample_daily(rd.from_pandas(df).repartition(nblocks),
                           "user_id", "ts", "value", nbuckets=4)
            .to_pandas().sort_values(["user_id", "day"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)
    # zero-filled gap rows really exist
    assert (want["n"] == 0).any()


def test_grouped_mode_matches_pandas(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.agg import grouped_mode

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "g": rng.choice(["x", "y", "z"], 600),
        "v": rng.integers(0, 7, 600).astype("int64"),
    })
    for nblocks in (1, 5):
        got = (grouped_mode(rd.from_pandas(df).repartition(nblocks),
                            ["g"], "v", nbuckets=4)
               .to_pandas().sort_values("g").reset_index(drop=True))
        want_rows = []
        for g, sub in df.groupby("g"):
            vc = sub["v"].value_counts()
            top = vc.max()
            mode = min(vc[vc == top].index)
            want_rows.append((g, mode, int(top)))
        want = pd.DataFrame(want_rows, columns=["g", "mode", "n"]).astype(
            {"mode": "int64", "n": "int64"})
        pd.testing.assert_frame_equal(got, want)


def test_grouped_first_last_matches_pandas(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.agg import grouped_first_last

    rng = np.random.default_rng(13)
    n = 500
    df = pd.DataFrame({
        "k": rng.integers(0, 9, n).astype("int64"),
        "ts": rng.integers(0, 40, n).astype("int64"),  # heavy ts ties
        "id": rng.permutation(n).astype("int64"),
        "val": rng.choice(list("abcd"), n),
    })
    for nblocks in (1, 6):
        got = (grouped_first_last(
                   rd.from_pandas(df).repartition(nblocks),
                   "k", ["ts", "id"], "val", nbuckets=4)
               .to_pandas().sort_values("k").reset_index(drop=True))
        s = df.sort_values(["k", "ts", "id"], kind="stable")
        first = s.groupby("k").head(1).set_index("k")["val"].sort_index()
        last = s.groupby("k").tail(1).set_index("k")["val"].sort_index()
        want = pd.DataFrame({"k": first.index,
                             "first_val": first.to_numpy(),
                             "last_val": last.to_numpy()})
        pd.testing.assert_frame_equal(got, want)


def test_interval_join_matches_bruteforce(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.joins import interval_join

    rng = np.random.default_rng(7)

    def mk(n):
        lo = rng.integers(0, 1000, n).astype("int64")
        return pd.DataFrame({
            "k": rng.integers(0, 6, n).astype("int64"),
            "lo": lo,
            "hi": lo + rng.integers(0, 80, n).astype("int64"),
        })

    a, b = mk(150), mk(120)
    want = a.merge(b, on="k", suffixes=("", "_r"))
    want = want[(want["lo"] <= want["hi_r"]) & (want["lo_r"] <= want["hi"])]
    want = (want[["k", "lo", "hi", "lo_r", "hi_r"]]
            .sort_values(["k", "lo", "hi", "lo_r", "hi_r"])
            .reset_index(drop=True))
    for nblocks in (1, 5):
        got = (interval_join(rd.from_pandas(a).repartition(nblocks),
                             rd.from_pandas(b).repartition(nblocks),
                             by=["k"], nbuckets=4)
               .to_pandas()
               .sort_values(["k", "lo", "hi", "lo_r", "hi_r"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)
    assert len(want) > 0


def test_multiset_set_op_property(ray_session):
    """Property: multiset_set_op ≡ collections.Counter arithmetic for
    random multisets and block layouts."""
    from collections import Counter

    import ray.data as rd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hikma_engine_ray.stages.dedup import multiset_set_op

    @settings(max_examples=15, deadline=None)
    @given(
        la=st.lists(st.integers(0, 8), max_size=30),
        rb=st.lists(st.integers(0, 8), max_size=30),
        nblocks=st.integers(1, 4),
    )
    def prop(la, rb, nblocks):
        dl = rd.from_pandas(pd.DataFrame({"k": la or [99]})).repartition(
            nblocks)
        dr = rd.from_pandas(pd.DataFrame({"k": rb or [98]})).repartition(
            nblocks)
        cl, cr = Counter(la or [99]), Counter(rb or [98])
        for op, expect in (
            ("intersect_all", cl & cr),
            ("except_all", cl - cr),
        ):
            df = multiset_set_op(dl, dr, ["k"], op).to_pandas()
            got = ({} if df.empty else
                   dict(zip(df["k"].tolist(), df["mult"].tolist())))
            assert got == {k: v for k, v in expect.items() if v > 0}, op

    prop()
