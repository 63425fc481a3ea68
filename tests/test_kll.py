"""KLL quantile sketch: rank-error accuracy gate vs exact quantiles,
merge correctness, determinism across block layouts."""

import numpy as np
import pyarrow as pa


def _rank_error(sketch_val, sorted_vals):
    """|rank(sketch_val) - target_rank| / n for the value returned."""
    return np.searchsorted(sorted_vals, sketch_val, side="right") / len(sorted_vals)


def test_kll_accuracy_vs_exact():
    from hikma_engine_ray.stages.kll import KLL

    rng = np.random.default_rng(42)
    vals = rng.lognormal(0, 2, size=200_000)
    s = KLL(k=256)
    s.update_many(vals)
    sv = np.sort(vals)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        got = s.quantile(q)
        err = abs(_rank_error(got, sv) - q)
        assert err < 0.02, (q, err)   # 2% rank error at k=256


def test_kll_merge_equals_single_stream():
    from hikma_engine_ray.stages.kll import KLL

    rng = np.random.default_rng(7)
    vals = rng.normal(size=50_000)
    parts = np.array_split(vals, 9)
    merged = KLL(k=256)
    for p in parts:
        s = KLL(k=256)
        s.update_many(p)
        merged.merge(s)
    sv = np.sort(vals)
    for q in (0.1, 0.5, 0.9):
        err = abs(_rank_error(merged.quantile(q), sv) - q)
        assert err < 0.03, (q, err)
    assert merged.n == len(vals)


def test_kll_quantiles_dataset_and_layout(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.kll import kll_quantiles

    rng = np.random.default_rng(3)
    vals = rng.uniform(0, 1000, size=30_000)
    tbl = pa.table({"v": pa.array(vals, pa.float64())})
    sv = np.sort(vals)
    for nblocks in (1, 8):
        ds = rd.from_arrow(tbl).repartition(nblocks)
        out = kll_quantiles(ds, "v", [0.5, 0.9])
        for q in (0.5, 0.9):
            err = abs(_rank_error(out[f"q{q}"], sv) - q)
            assert err < 0.03, (nblocks, q, err)
    # determinism: same layout → identical result
    ds = rd.from_arrow(tbl).repartition(8)
    a = kll_quantiles(ds, "v", [0.5])
    b = kll_quantiles(ds, "v", [0.5])
    assert a == b


def test_kll_small_and_empty(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.kll import KLL, kll_quantiles

    s = KLL(k=16)
    for v in [3.0, 1.0, 2.0]:
        s.update(v)
    assert s.quantile(0.0) == 1.0 and s.quantile(1.0) == 3.0
    empty = rd.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
    out = kll_quantiles(empty, "v", [0.5])
    assert np.isnan(out["q0.5"])


def test_grouped_kll_rank_error(ray_session):
    """Per-group KLL quantiles within 3% rank error of exact, per
    group, independent of block layout."""
    import pyarrow as pa
    import ray.data as rd

    from hikma_engine_ray.stages.kll import grouped_kll_quantiles

    rng = np.random.default_rng(23)
    n = 30000
    groups = rng.choice(["x", "y", "z"], n)
    vals = np.where(groups == "x", rng.normal(0, 1, n),
                    np.where(groups == "y", rng.exponential(5, n),
                             rng.uniform(-3, 3, n)))
    t = pa.table({"g": pa.array(groups), "v": pa.array(vals, pa.float64())})
    out = {
        r["g"]: r
        for r in grouped_kll_quantiles(
            rd.from_arrow(t).repartition(7), "v", "g", [0.5, 0.9]
        ).take_all()
    }
    for g in ("x", "y", "z"):
        sv = np.sort(vals[groups == g])
        for q in (0.5, 0.9):
            err = abs(_rank_error(out[g][f"q{int(q*100)}"], sv) - q)
            assert err <= 0.03, (g, q, err)
