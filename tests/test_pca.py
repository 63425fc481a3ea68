"""Distributed PCA (stages/pca) ≡ serial numpy PCA: sufficient-stat
combine across block layouts, sign-fixed components, projection
coordinates, explained-variance ratios, and an anisotropic dataset
where PC1 must capture the dominant axis."""

import numpy as np
import pandas as pd
import pytest

from hikma_engine_ray.stages.pca import pca_embed, pca_fit


def _vecs(n=200, d=8, seed=3):
    rng = np.random.default_rng(seed)
    # anisotropic: axis 0 has 10x the std of the rest
    x = rng.normal(0, 1, (n, d))
    x[:, 0] *= 10
    x[:, 1] *= 3
    return x + rng.normal(5, 0.1, d)


def _serial_pca(x, k):
    mu = x.mean(axis=0)
    c = np.cov(x, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(c)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    ratio = np.maximum(evals[order], 0) / evals.sum()
    return mu, comps, ratio


def _ds(x, nblocks):
    import ray.data as rd

    df = pd.DataFrame({
        "vec_id": np.arange(len(x), dtype="int64"),
        "embedding": [row.astype("float32").tolist() for row in x],
    })
    return rd.from_pandas(df).repartition(nblocks)


@pytest.mark.parametrize("nblocks", [1, 6])
def test_fit_matches_serial(ray_session, nblocks):
    x = _vecs()
    xf = x.astype(np.float32).astype(np.float64)  # engine sees float32
    mu_s, comps_s, ratio_s = _serial_pca(xf, 3)
    mu, comps, ratio = pca_fit(_ds(x, nblocks), k=3)
    np.testing.assert_allclose(mu, mu_s, atol=1e-9)
    np.testing.assert_allclose(comps, comps_s, atol=1e-7)
    np.testing.assert_allclose(ratio, ratio_s, atol=1e-9)
    # dominant axis recovered
    assert abs(comps[0, 0]) > 0.99
    assert ratio[0] > 0.8


def test_embed_coords_match_serial(ray_session):
    x = _vecs(n=120, d=5, seed=9)
    xf = x.astype(np.float32).astype(np.float64)
    mu_s, comps_s, _ = _serial_pca(xf, 2)
    want = np.round((xf - mu_s) @ comps_s.T, 6)
    out = (pca_embed(_ds(x, 4), k=2).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    np.testing.assert_allclose(out["pc1"].to_numpy(), want[:, 0], atol=1e-6)
    np.testing.assert_allclose(out["pc2"].to_numpy(), want[:, 1], atol=1e-6)


def test_too_few_rows_raises(ray_session):
    with pytest.raises(ValueError):
        pca_fit(_ds(np.zeros((1, 4)), 1), k=1)


def test_pca_fit_return_stats(ray_session):
    """return_stats exposes the SQL-recomputable quantities backing
    the pca_check oracle: total_var = trace of the ddof-1 sample
    covariance, descending non-negative top-k eigenvalues, and the
    components stay orthonormal."""
    x = _vecs(n=90, d=6, seed=4)
    xf = x.astype(np.float32).astype(np.float64)
    _, comps, ratio, st = pca_fit(_ds(x, 3), k=2, return_stats=True)
    assert st["n"] == 90 and st["d"] == 6
    want_var = float(np.cov(xf, rowvar=False, ddof=1).trace())
    np.testing.assert_allclose(st["total_var"], want_var, rtol=1e-10)
    ev = st["evals"]
    assert len(ev) == 2 and ev[0] >= ev[1] >= -1e-12
    gram = comps @ comps.T
    assert abs(gram - np.eye(2)).max() < 1e-9
    assert 0.0 < float(ratio.sum()) <= 1.0 + 1e-12
