"""Distributed k-means (Lloyd's algorithm) over an embedding column.

The iterative-refinement pattern on Ray Data: per iteration the k
centroids (k × d floats — tiny) are broadcast via ``ray.put`` and ONE
``map_batches`` pass emits per-block PARTIAL rows (cluster, count,
sum-vector) — the combiner-first shape, so the driver reduces
O(k × blocks) rows per iteration and the corpus never shuffles, never
materializes. Standard uses in a training-data pipeline: IVF coarse
quantizer training, semantic-cluster balancing, diversity sampling.

Determinism (so the driver's rows-only check and the local
engine≡reference gate are stable):

* init: the k seed vectors are the rows with the k smallest
  ``md5(str(id))`` digests (ties by id) — a content-addressed sample,
  independent of block layout, gathered with one tiny per-block top-k.
* assignment ties (equidistant centroids) break to the LOWEST cluster
  index (argmin semantics) on exact float equality.
* the driver reduce sorts partials by (cluster, block-min id) before
  summing, so float addition order never depends on task arrival
  order. Different BLOCK LAYOUTS can still reorder the global sum —
  assignments are insensitive to that (no near-degenerate ties in
  float64 for real data); the equivalence test asserts identical
  assignments + allclose centroids vs a serial reference.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _mat(col) -> np.ndarray:
    """list<float> column → (n, dim) float64 matrix via the Arrow list
    buffer (no per-row Python materialization in the Lloyd kernel)."""
    ca = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(ca)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    flat = ca.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(np.float64, copy=False).reshape(n, -1)


def _seed_centroids(ds, k: int, vec_col: str, id_col: str) -> np.ndarray:
    """k seed vectors by smallest md5(str(id)): per-block top-k partials,
    driver merge — deterministic for any block layout."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        if not ids:
            return pa.table({"h": pa.array([], pa.string()),
                             "id": pa.array([], pa.int64()),
                             "v": batch[vec_col].slice(0, 0)})
        hs = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        order = np.lexsort((np.asarray(ids), np.asarray(hs)))[:k]
        idx = pa.array(order.astype(np.int64))
        return pa.table(
            {
                "h": pa.array([hs[i] for i in order], pa.string()),
                "id": pa.array([ids[i] for i in order], pa.int64()),
                "v": batch[vec_col].take(idx),
            }
        )

    part = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    part = part.sort_values(["h", "id"], kind="stable").head(k)
    return np.asarray(part["v"].to_list(), dtype=np.float64)


def kmeans_fit(ds, k: int = 8, iters: int = 10,
               vec_col: str = "embedding", id_col: str = "vec_id",
               tol: float = 0.0):
    """Fit centroids. Returns (centroids ndarray (k × d), n_iters_run).
    Empty clusters keep their previous centroid (standard Lloyd's
    fallback). Stops early when max centroid movement ≤ tol."""
    import ray

    cents = _seed_centroids(ds, k, vec_col, id_col)
    if len(cents) == 0:
        return cents, 0
    k = len(cents)  # fewer rows than k → degrade gracefully

    for it in range(iters):
        ref = ray.put(cents)

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            vecs = _mat(batch[vec_col])
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            if not len(ids):
                d = c.shape[1]
                return pa.table({
                    "cluster": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "bmin": pa.array([], pa.int64()),
                    "s": pa.FixedSizeListArray.from_arrays(
                        pa.array([], pa.float64()), d
                    ),
                })
            # ||v - c||² = ||v||² - 2 v·c + ||c||²; argmin over c
            d2 = (
                -2.0 * (vecs @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            assign = np.argmin(d2, axis=1)
            sums = np.zeros((len(c), c.shape[1]), dtype=np.float64)
            np.add.at(sums, assign, vecs)
            counts = np.bincount(assign, minlength=len(c)).astype(np.int64)
            hit = counts > 0
            cl = np.flatnonzero(hit).astype(np.int64)
            svals = pa.FixedSizeListArray.from_arrays(
                pa.array(sums[hit].ravel(), pa.float64()), c.shape[1]
            )
            return pa.table({
                "cluster": pa.array(cl, pa.int64()),
                "n": pa.array(counts[hit], pa.int64()),
                "bmin": pa.array(np.full(len(cl), ids.min()), pa.int64()),
                "s": svals,
            })

        part = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None).to_pandas()
        if not len(part):
            return cents, it
        # deterministic reduce order: (cluster, block-min id)
        part = part.sort_values(["cluster", "bmin"], kind="stable")
        new = cents.copy()
        for cl, grp in part.groupby("cluster", sort=True):
            total = np.add.reduce(
                np.asarray(grp["s"].to_list(), dtype=np.float64), axis=0
            )
            new[int(cl)] = total / grp["n"].sum()
        shift = float(np.abs(new - cents).max())
        cents = new
        if shift <= tol:
            return cents, it + 1
    return cents, iters


def kmeans_assign(ds, centroids: np.ndarray,
                  vec_col: str = "embedding", id_col: str = "vec_id"):
    """Assign every row to its nearest centroid: streaming map, output
    (id, cluster, dist2). Broadcast centroids; no shuffle."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def fn(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        vecs = _mat(batch[vec_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        if not len(ids):
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "dist2": pa.array([], pa.float64())})
        d2 = (
            (vecs * vecs).sum(axis=1)[:, None]
            - 2.0 * (vecs @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        assign = np.argmin(d2, axis=1).astype(np.int64)
        best = np.maximum(d2[np.arange(len(ids)), assign], 0.0)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "cluster": pa.array(assign, pa.int64()),
                         "dist2": pa.array(best, pa.float64())})

    return ds.map_batches(fn, batch_format="pyarrow")
