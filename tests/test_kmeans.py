"""Distributed k-means: equivalence against a serial reference, block-
layout invariance of assignments, empty-cluster and early-stop edges."""

import hashlib

import numpy as np
import pyarrow as pa


def _blobs(n=300, d=6, k=4, seed=7):
    """Well-separated deterministic gaussian blobs."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 20.0, size=(k, d))
    pts = np.concatenate(
        [centers[i] + rng.normal(0, 0.5, size=(n // k, d)) for i in range(k)]
    )
    ids = np.arange(len(pts), dtype=np.int64)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, p)) for p in pts],
                                  pa.list_(pa.float32())),
        }
    )


def _serial_kmeans(tbl, k, iters):
    """Reference Lloyd's with the SAME seeding rule, run serially."""
    vecs = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    ids = np.asarray(tbl["vec_id"].to_pylist())
    hs = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
    order = np.lexsort((ids, np.asarray(hs)))[:k]
    cents = vecs[order].copy()
    for _ in range(iters):
        d2 = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                cents[c] = vecs[m].mean(axis=0)
    return cents, assign


def test_kmeans_matches_serial_reference(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.kmeans import kmeans_assign, kmeans_fit

    tbl = _blobs()
    ds = rd.from_arrow(tbl).repartition(8)
    cents, it = kmeans_fit(ds, k=4, iters=5)
    ref_cents, ref_assign = _serial_kmeans(tbl, 4, 5)
    np.testing.assert_allclose(cents, ref_cents, rtol=1e-9, atol=1e-9)
    got = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    assert got["cluster"].to_numpy().tolist() == ref_assign.tolist()
    # well-separated blobs recover the 4 groups exactly
    assert len(set(got["cluster"])) == 4


def test_kmeans_block_layout_invariant_assignments(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.kmeans import kmeans_assign, kmeans_fit

    tbl = _blobs(seed=11)
    a_ds = rd.from_arrow(tbl)                    # one block
    b_ds = rd.from_arrow(tbl).repartition(16)    # many blocks
    ca, _ = kmeans_fit(a_ds, k=4, iters=6)
    cb, _ = kmeans_fit(b_ds, k=4, iters=6)
    ga = kmeans_assign(a_ds, ca).to_pandas().sort_values("vec_id")
    gb = kmeans_assign(b_ds, cb).to_pandas().sort_values("vec_id")
    assert ga["cluster"].tolist() == gb["cluster"].tolist()


def test_kmeans_early_stop_and_small_input(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.kmeans import kmeans_fit

    tbl = _blobs(n=40, k=2, seed=3)
    ds = rd.from_arrow(tbl)
    # tol large enough that iteration 1 or 2 converges
    _, it = kmeans_fit(ds, k=2, iters=50, tol=1e-6)
    assert it < 50
    # k larger than the row count degrades to n centroids, no crash
    small = rd.from_arrow(tbl).limit(3)
    cents, _ = kmeans_fit(small, k=8, iters=2)
    assert len(cents) == 3
