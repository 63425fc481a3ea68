"""Distributed PCA over an embedding column — dimensionality
reduction for the similarity/dedup suite (whiten before LSH, 2-D
corpus maps, variance diagnostics). Public algorithm: covariance-
method PCA via one streaming pass of sufficient statistics
(n, Σx, ΣxᵀΣx partials per block — the textbook single-pass scheme),
eigendecomposition of the d×d covariance on the driver, then one
broadcast projection pass.

Scale shape (NO shuffle at all — the reduce is driver-side over
per-block d×d partials):

  vectors --map_batches--> (n, sum[d], xtx[d*d]) one row per block
          --driver combine--> mean, covariance, eigh (d×d, tiny)
  vectors --map_batches (mean/components ray.put once)--> coords

100 TB note: the only thing that ever leaves a worker is one
(d² + d + 1)-float row PER BLOCK — independent of row count. The
driver holds d×d floats (d = embedding dim, ≤ a few thousand →
≤ tens of MB). The projection pass is embarrassingly parallel.
Determinism: components are sign-fixed (largest-|entry| positive) so
outputs are reproducible across layouts and match the serial gate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import _to_matrix


def pca_fit(ds, vec_col: str = "embedding", k: int = 2,
            return_stats: bool = False):
    """One streaming pass → (mean[d], components[k,d],
    explained_variance_ratio[k]). Sample covariance (ddof=1).
    With ``return_stats=True`` a fourth element is appended:
    {'n', 'd', 'total_var' (= trace of the sample covariance =
    Σ eigenvalues), 'evals' (descending, top-k)} — the
    SQL-recomputable quantities backing the pca_check oracle gate."""

    def partial(t: pa.Table) -> pa.Table:
        x = _to_matrix(t[vec_col]).astype(np.float64)
        if x.size == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.binary()),
                             "xtx": pa.array([], pa.binary())})
        return pa.table({
            "n": pa.array([x.shape[0]], pa.int64()),
            "s": pa.array([x.sum(axis=0).tobytes()], pa.binary()),
            "xtx": pa.array([(x.T @ x).tobytes()], pa.binary()),
        })

    rows = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(rows["n"].sum())
    if n < 2:
        raise ValueError("PCA needs at least 2 vectors")
    s = None
    xtx = None
    for sb, xb in zip(rows["s"], rows["xtx"]):
        sv = np.frombuffer(sb, dtype=np.float64)
        xv = np.frombuffer(xb, dtype=np.float64)
        s = sv if s is None else s + sv
        xtx = xv if xtx is None else xtx + xv
    d = s.shape[0]
    xtx = xtx.reshape(d, d)
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)   # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T            # (k, d)
    # deterministic sign: the largest-|entry| of each component > 0
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    ratio = np.maximum(evals[order], 0.0) / max(evals.sum(), 1e-300)
    if return_stats:
        stats = {"n": n, "d": d, "total_var": float(evals.sum()),
                 "evals": evals[order].copy()}
        return mean, comps, ratio, stats
    return mean, comps, ratio


def pca_transform(ds, mean: np.ndarray, components: np.ndarray,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  ndigits: int = 6):
    """Broadcast projection pass → Dataset (id_col, pc1..pck)."""
    import ray

    from ..functions.num import round_half_away

    mref = ray.put(mean.astype(np.float64))
    cref = ray.put(components.astype(np.float64))
    k = components.shape[0]

    def proj(t: pa.Table) -> pa.Table:
        mu, c = ray.get(mref), ray.get(cref)
        x = _to_matrix(t[vec_col]).astype(np.float64)
        ids = t[id_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        coords = (x - mu) @ c.T if x.size else np.zeros((0, k))
        cols = {id_col: pa.array(ids, pa.int64())}
        for i in range(k):
            cols[f"pc{i + 1}"] = pa.array(
                round_half_away(coords[:, i], ndigits), pa.float64())
        return pa.table(cols)

    return ds.map_batches(proj, batch_format="pyarrow")


def pca_embed(ds, k: int = 2, vec_col: str = "embedding",
              id_col: str = "vec_id", ndigits: int = 6):
    """fit + transform in one call → Dataset (id, pc1..pck)."""
    mean, comps, _ratio = pca_fit(ds, vec_col=vec_col, k=k)
    return pca_transform(ds, mean, comps, vec_col=vec_col, id_col=id_col,
                         ndigits=ndigits)
