"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
arXiv:2303.09540 — public): k-means-cluster the embedding space, then
within each cluster drop every item whose cosine similarity to a
LOWER-ID item of the same cluster reaches the threshold. Clustering
bounds the quadratic pair comparison to within-cluster blocks — the
paper's point, and the reason this scales where all-pairs cosine does
not (the reference engine has no semantic dedup; this is a
training-data-pipeline operator built on the repo's kmeans kernels).

Ray shape: ``kmeans_fit`` (combiner-first Lloyd's, no shuffle) →
one assignment pass that KEEPS the vector column → ONE
``groupby(cluster)`` shuffle → per-cluster vectorized Gram matrix.
The keep rule is order-free ("∃ same-cluster lower-id neighbor ≥ τ"),
so results are independent of block layout, and the DuckDB oracle can
replay it exactly from the exported (id, cluster) assignment (the
clustering itself is invariant-gated by the kmeans_check query).

Per-cluster memory is the Gram matrix: O(c²) for cluster size c.
``max_cluster`` guards the pathological giant cluster by sub-bucketing
it on a deterministic id hash and deduping within sub-buckets only —
a documented recall trade (cross-sub-bucket near-dups survive), the
same contract as the paper's fixed cluster budget. At 100 TB, k is
sized so c ≈ corpus/k stays ~10⁴-10⁵ (SCALE.md).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .kmeans import _mat, kmeans_fit

SEMDEDUP_SCHEMA = pa.schema(
    [
        ("vec_id", pa.int64()),
        ("cluster", pa.int64()),
        ("kept", pa.int64()),
    ]
)


def assign_with_vectors(ds, centroids: np.ndarray,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id"):
    """Nearest-centroid assignment that carries the vector through
    (kmeans_assign drops it): output (id, cluster, vec_col)."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def fn(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        vecs = _mat(batch[vec_col])
        n = batch.num_rows
        if n == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             vec_col: batch[vec_col]})
        d2 = (
            (vecs * vecs).sum(axis=1)[:, None]
            - 2.0 * (vecs @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        assign = np.argmin(d2, axis=1).astype(np.int64)
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            "cluster": pa.array(assign, pa.int64()),
            vec_col: batch[vec_col],
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def _dedup_group(ids: np.ndarray, vecs: np.ndarray, tau: float) -> np.ndarray:
    """kept flags for one (sub-)cluster: sort by id, Gram matrix in
    float64, drop row i iff any earlier (lower-id) row has cos ≥ τ."""
    order = np.argsort(ids, kind="stable")
    v = vecs[order]
    norms = np.linalg.norm(v, axis=1, keepdims=True)
    np.maximum(norms, 1e-12, out=norms)
    v = v / norms
    sims = v @ v.T
    n = len(ids)
    dup = np.zeros(n, dtype=bool)
    # strictly-lower-triangle test, vectorized: max over j < i
    tril = np.tril(sims, k=-1)
    dup = (tril >= tau).any(axis=1)
    kept = np.ones(n, dtype=np.int64)
    kept[dup] = 0
    out = np.empty(n, dtype=np.int64)
    out[order] = kept
    return out


def semdedup(emb_ds, *, k: int = 8, tau: float = 0.85, iters: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             max_cluster: int = 100_000):
    """Returns a Dataset (vec_id, cluster, kept) — kept=0 rows are the
    semantic duplicates SemDeDup would discard at threshold ``tau``."""
    cents, _ = kmeans_fit(emb_ds, k=k, iters=iters,
                          vec_col=vec_col, id_col=id_col)
    assigned = assign_with_vectors(emb_ds, cents,
                                   vec_col=vec_col, id_col=id_col)

    def per_cluster(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return SEMDEDUP_SCHEMA.empty_table()
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = _mat(t[vec_col])
        cluster = t["cluster"].cast(pa.int64())
        if n > max_cluster:
            # giant-cluster guard: dedup within deterministic id-hash
            # sub-buckets (documented recall trade — see module doc)
            nsub = int(np.ceil(n / max_cluster))
            sub = (ids * np.int64(0x9E3779B1)) % np.int64(nsub)
            kept = np.ones(n, dtype=np.int64)
            for s in range(nsub):
                m = sub == s
                if m.any():
                    kept[m] = _dedup_group(ids[m], vecs[m], tau)
        else:
            kept = _dedup_group(ids, vecs, tau)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": cluster,
            "kept": pa.array(kept, pa.int64()),
        })

    return assigned.groupby("cluster").map_groups(
        per_cluster, batch_format="pyarrow")
