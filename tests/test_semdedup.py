"""SemDeDup stage properties (stages/semdedup.py): the keep rule is
"drop iff a same-cluster LOWER-ID row sits at cosine >= tau" — checked
directly against brute-force cosine per cluster, plus the giant-cluster
sub-bucket guard's weaker contract."""

import numpy as np
import pyarrow as pa


def _emb_table(n=120, dim=16, seed=7, dup_every=5):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, dim))
    # plant near-duplicates: every dup_every-th row is a jittered copy
    # of the previous row so the threshold actually fires
    for i in range(1, n):
        if i % dup_every == 0:
            v[i] = v[i - 1] + rng.normal(scale=1e-3, size=dim)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([row.astype(np.float32).tolist()
                               for row in v],
                              pa.list_(pa.float32())),
    })


def _brute_kept(res, emb, tau, key=None):
    """Expected kept flags from brute-force cosine within groups
    (group = cluster, or (cluster, subbucket) when key is given)."""
    vecs = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = sorted(res.to_pylist(), key=lambda r: r["vec_id"])
    expect = {}
    for r in rows:
        i = r["vec_id"]
        grp_i = key(r) if key else r["cluster"]
        dup = False
        for s in rows:
            j = s["vec_id"]
            if j >= i:
                break
            grp_j = key(s) if key else s["cluster"]
            if grp_j == grp_i and vecs[i] @ vecs[j] >= tau:
                dup = True
                break
        expect[i] = 0 if dup else 1
    return expect


def test_semdedup_matches_bruteforce(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.semdedup import semdedup

    emb = _emb_table()
    tau = 0.9
    res = pa.concat_tables(
        semdedup(rd.from_arrow(emb), k=4, tau=tau, iters=5)
        .iter_batches(batch_format="pyarrow"))
    assert res.num_rows == emb.num_rows
    expect = _brute_kept(res, emb, tau)
    got = {r["vec_id"]: r["kept"] for r in res.to_pylist()}
    assert got == expect
    assert sum(1 for v in got.values() if v == 0) > 0  # dups planted


def test_semdedup_giant_cluster_guard(ray_session):
    """Past max_cluster, dedup runs within deterministic id-hash
    sub-buckets: kept flags must match brute force under the
    (cluster, subbucket) grouping."""
    import ray.data as rd

    from hikma_engine_ray.stages.semdedup import semdedup

    emb = _emb_table(n=90)
    tau = 0.9
    res = pa.concat_tables(
        semdedup(rd.from_arrow(emb), k=2, tau=tau, iters=3,
                 max_cluster=20)
        .iter_batches(batch_format="pyarrow"))
    # recompute each row's sub-bucket from its cluster's size (the
    # stage derives nsub from the cluster population)
    from collections import Counter
    sizes = Counter(r["cluster"] for r in res.to_pylist())

    def key(r):
        n = sizes[r["cluster"]]
        if n <= 20:
            return (r["cluster"], 0)
        nsub = int(np.ceil(n / 20))
        return (r["cluster"],
                int((r["vec_id"] * 0x9E3779B1) % nsub))

    expect = _brute_kept(res, emb, tau, key=key)
    got = {r["vec_id"]: r["kept"] for r in res.to_pylist()}
    assert got == expect
