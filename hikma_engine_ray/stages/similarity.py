"""Similarity search over embedding columns (SURVEY.md §2.6 T1/T2 +
the ANN scale path).

Brute-force top-k: the query matrix is broadcast once (``ray.put``);
each batch computes a vectorized matmul and keeps its per-block partial
top-k; the tiny partials are merged with one final sort — no full-data
sort, no driver-side loop over rows.

IVF variant: vectors are assigned to deterministic k-means-ish
centroids (seeded random projections refined one Lloyd step); a query
probes only the closest ``nprobe`` centroid partitions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_matrix(col) -> np.ndarray:
    """list<float> column → (n, dim) float32 matrix without a Python
    row materialization: flatten the Arrow list buffer and reshape
    (zero-copy from the object store up to the dtype cast)."""
    ca = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(ca)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float32)
    flat = ca.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(np.float32, copy=False).reshape(n, -1)


def brute_force_topk(ds, query_vec: np.ndarray, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     metric: str = "cosine"):
    """Top-k nearest rows to ``query_vec``. Returns a Dataset with
    columns (id_col, score) sorted descending, length ≤ k."""
    import ray

    # keep the query's raw float32 values, but do ALL arithmetic in
    # float64 (matches an SQL oracle that upcasts list<float> to double)
    q = np.asarray(query_vec, dtype=np.float32)
    q_ref = ray.put(q)

    def partial(batch: pa.Table) -> pa.Table:
        from ..functions.num import round_half_away

        # score in float64 so results match an SQL oracle that upcasts
        qv = ray.get(q_ref).astype(np.float64)
        mat = _to_matrix(batch[vec_col]).astype(np.float64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        if metric == "cosine":
            norms = np.linalg.norm(mat, axis=1) * max(float(np.linalg.norm(qv)), 1e-12)
            norms[norms == 0] = 1.0
            scores = (mat @ qv) / norms
        else:  # dot
            scores = mat @ qv
        top = np.argsort(-scores, kind="stable")[:k]
        return pa.table(
            {
                id_col: pa.array(ids[top], pa.int64()),
                "score": pa.array(round_half_away(scores[top], 6), pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    # merge: the partials are ≤ k × nblocks rows — a tiny global sort
    return partials.sort(["score", id_col], descending=[True, False]).limit(k)


def cosine_pairs(ds, threshold: float, vec_col: str = "embedding",
                 id_col: str = "vec_id"):
    """EXACT all-pairs cosine similarity join: every (a < b) pair with
    cosine >= threshold. The normalized matrix is broadcast ONCE
    (``ray.put``); each batch does one blocked float64 matmul against
    it and emits only its qualifying pairs — no driver loop, no
    per-pair Python.

    This is the ground-truth generator for the embedding near-dup
    RECALL gate (and small-corpus exact joins): the output is the
    result-sized pair set, but the COMPUTE is inherently O(n²/blocks)
    — that is the definition of exact all-pairs truth. At 100 TB this
    runs on a verification SAMPLE; the production near-dup path is
    ``dedup_suite.embedding_neardup`` (hyperplane LSH, no all-pairs)."""
    import ray

    mat_t = ds.select_columns([id_col, vec_col]).to_arrow_refs()
    tabs = [t for t in ray.get(mat_t) if t.num_rows]
    full = pa.concat_tables(tabs, promote_options="default") if tabs else None
    if full is None or full.num_rows == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}))
    all_ids = full[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    M = _to_matrix(full[vec_col]).astype(np.float64)
    nrm = np.linalg.norm(M, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    ref = ray.put((all_ids, M / nrm))

    def partial(batch: pa.Table) -> pa.Table:
        ids_all, Mn = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        B = _to_matrix(batch[vec_col]).astype(np.float64)
        if len(ids) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        n = np.linalg.norm(B, axis=1, keepdims=True)
        n[n == 0] = 1.0
        S = (B / n) @ Mn.T
        r, c = np.nonzero((S >= threshold) & (ids[:, None] < ids_all[None, :]))
        return pa.table({"a": pa.array(ids[r], pa.int64()),
                         "b": pa.array(ids_all[c], pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow")


class IVFIndex:
    """Deterministic IVF for embedding Datasets.

    ``fit`` samples vectors, seeds centroids from a fixed RNG and runs a
    few Lloyd steps; ``assign`` is a map_batches stage adding a
    ``centroid`` column (the partition key a cluster deployment would
    write Parquet partitions by); ``search`` probes the ``nprobe``
    nearest partitions only."""

    def __init__(self, ncentroids: int = 16, seed: int = 5):
        self.ncentroids = ncentroids
        self.seed = seed
        self.centroids: np.ndarray | None = None

    def fit(self, ds, vec_col: str = "embedding", sample: int = 2048, iters: int = 4):
        import ray.data  # noqa: F401

        # unbiased training sample: seeded random_sample streams the
        # whole dataset (a limit() prefix would see only the first
        # blocks — biased if the input is ordered/partitioned)
        total = ds.count()
        if total > sample:
            frac = min(1.0, (sample * 1.25) / total)
            rows = ds.random_sample(frac, seed=self.seed).limit(sample).to_pandas()
        else:
            rows = ds.to_pandas()
        mat = np.asarray(rows[vec_col].tolist(), dtype=np.float32)
        rng = np.random.RandomState(self.seed)
        idx = rng.choice(len(mat), size=min(self.ncentroids, len(mat)), replace=False)
        cent = mat[idx].copy()
        for _ in range(iters):
            d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = d.argmin(1)
            for c in range(len(cent)):
                sel = mat[assign == c]
                if len(sel):
                    cent[c] = sel.mean(0)
        self.centroids = cent
        return self

    def assign(self, ds, vec_col: str = "embedding"):
        import ray

        cent_ref = ray.put(self.centroids)

        def fn(batch: pa.Table) -> pa.Table:
            cent = ray.get(cent_ref)
            mat = _to_matrix(batch[vec_col])
            if len(mat) == 0:
                return batch.append_column("centroid", pa.array([], pa.int32()))
            d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            return batch.append_column(
                "centroid", pa.array(d.argmin(1).astype(np.int32), pa.int32())
            )

        return ds.map_batches(fn, batch_format="pyarrow")

    def search(self, assigned_ds, query_vec: np.ndarray, k: int = 10,
               nprobe: int = 4, vec_col: str = "embedding", id_col: str = "vec_id"):
        import pyarrow.compute as pc

        q = np.asarray(query_vec, dtype=np.float32)
        d = ((self.centroids - q[None, :]) ** 2).sum(-1)
        probe = set(int(x) for x in d.argsort()[:nprobe])
        probed = assigned_ds.map_batches(
            lambda t: t.filter(
                pc.is_in(t["centroid"], value_set=pa.array(sorted(probe), pa.int32()))
            ),
            batch_format="pyarrow",
        )
        return brute_force_topk(probed, q, k=k, vec_col=vec_col, id_col=id_col)
