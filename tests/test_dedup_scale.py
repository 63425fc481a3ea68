"""Round-2 dedup scale paths: vectorized kernels (value parity with the
per-item r1 kernels), distributed Jaccard verification (no driver-side
corpus materialization), max_hamming-correct simhash banding, and banded
embedding LSH recall."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _docs(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


# ----------------------------------------------------- kernel value parity

def test_simhash_batch_matches_per_token_reference():
    """The batch kernel must emit byte-identical simhashes to the r1
    per-token blake2b loop (same seeded hash, vectorized accumulation)."""
    import struct

    from hikma_engine_ray.stages.dedup_suite import (
        _WORD,
        _stable64,
        simhash64,
        simhash64_batch,
    )

    def slow(text):
        toks = _WORD.findall((text or "").lower())
        if not toks:
            return 0
        v = np.zeros(64, dtype=np.int64)
        for t in toks:
            h = _stable64(t.encode(), 7)
            bits = np.unpackbits(np.frombuffer(struct.pack(">Q", h), dtype=np.uint8))
            v += bits.astype(np.int64) * 2 - 1
        return int.from_bytes(np.packbits((v > 0).astype(np.uint8)).tobytes(), "big")

    texts = ["the quick brown fox", "", "hello world hello", "Mixed CASE text",
             "a", " \t\n ", "word " * 50]
    got = simhash64_batch(texts)
    assert [int(x) for x in got] == [slow(t) for t in texts]
    # pinned value: any change to the hash fn / bit order must be deliberate
    assert simhash64("the quick brown fox") == 0x0ACAC1050A6821C0


def test_minhash_batch_matches_per_shingle_reference():
    from hikma_engine_ray.stages.dedup_suite import (
        _A,
        _B,
        MinHashSigs,
        _shingles,
        _stable64,
    )

    def slow_sig(text, num_perm, k):
        sh = _shingles(text, k)
        sig = np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        if not sh:
            return sig
        base = np.fromiter((_stable64(s, 0) for s in sh), dtype=np.uint64, count=len(sh))
        for i in range(num_perm):
            sig[i] = (base * np.uint64(_A[i]) + np.uint64(_B[i])).min()
        return sig

    texts = ["one two three four five six", "", "one two three four five seven",
             "completely different words here now", "short"]
    m = MinHashSigs(num_perm=32, bands=8, k=3)
    sigs = m.signatures(texts)
    for j, t in enumerate(texts):
        assert np.array_equal(sigs[j], slow_sig(t, 32, 3)), t


# ------------------------------------------------- simhash banding radius

def test_simhash_band_layout_pigeonhole():
    from hikma_engine_ray.stages.dedup_suite import _simhash_band_layout

    for mh in (0, 1, 3, 8, 16, 63):
        lay = _simhash_band_layout(mh)
        assert len(lay) == mh + 1
        assert sum(w for _, w in lay) == 64
        # contiguous, non-overlapping
        shift = 0
        for s, w in lay:
            assert s == shift and w >= 1
            shift += w
    # default radius keeps the r1 4×16-bit layout (output compatibility)
    assert _simhash_band_layout(3) == [(0, 16), (16, 16), (32, 16), (48, 16)]


def test_simhash_candidates_find_mid_radius_pairs(ray_session):
    """hamming ∈ [4, 8] pairs were silently missed by the r1 fixed 4-band
    layout; with max_hamming=8 the 9-band layout must find them."""
    import pyarrow as pa
    import ray.data as rd

    from hikma_engine_ray.stages.dedup_suite import simhash64, simhash_candidates

    base = "the quick brown fox jumps over the lazy dog " * 6
    rng = np.random.RandomState(7)
    words = base.split()
    texts, target = [base], None
    h0 = simhash64(base)
    for trial in range(200):
        w = list(words)
        for _ in range(rng.randint(2, 7)):
            w[rng.randint(len(w))] = f"mut{rng.randint(1000)}"
        t = " ".join(w)
        d = bin(h0 ^ simhash64(t)).count("1")
        if 4 <= d <= 8 and target is None:
            target = (len(texts), d)
            texts.append(t)
    assert target is not None, "no mid-radius variant found (tune the generator)"
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )
    rows = simhash_candidates(ds, max_hamming=8).take_all()
    pairs = {(r["a"], r["b"]): r["hamming"] for r in rows}
    assert (0, target[0]) in pairs
    assert pairs[(0, target[0])] == target[1]


# ------------------------------------------- distributed Jaccard verify

def test_verify_jaccard_variants_match_broadcast(ray_session):
    import ray

    from hikma_engine_ray.stages.dedup_suite import (
        minhash_candidates,
        verify_jaccard,
        verify_jaccard_joined,
        verify_jaccard_pairs,
    )

    ds = _docs(ray_session)
    cand = minhash_candidates(ds, num_perm=64, bands=16, k=3).materialize()
    docs = {r["doc_id"]: r["text"] for r in ds.take_all()}
    bc = verify_jaccard(cand, ray.put(docs), threshold=0.4, k=3).take_all()
    jn = verify_jaccard_joined(cand, ds, threshold=0.4, k=3).take_all()
    pb = verify_jaccard_pairs(cand, ds, threshold=0.4, k=3).take_all()
    as_set = lambda rows: {(r["a"], r["b"], round(r["jaccard"], 9)) for r in rows}
    assert as_set(jn) == as_set(bc)
    assert as_set(pb) == as_set(bc)
    assert len(jn) > 0  # the synthetic docs contain near-dups by design


# ------------------------------------------------- embedding LSH recall

def _brute_pairs(vecs: np.ndarray, ids: np.ndarray, threshold: float) -> set:
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = vecs / norms
    sims = mat @ mat.T
    ia, ib = np.triu_indices(len(ids), k=1)
    keep = sims[ia, ib] >= threshold
    return {(int(min(a, b)), int(max(a, b))) for a, b in zip(ids[ia[keep]], ids[ib[keep]])}


def test_embedding_neardup_recall_vs_bruteforce(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.dedup_suite import embedding_neardup

    ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    rows = ds.take_all()
    ids = np.asarray([r["vec_id"] for r in rows], dtype=np.int64)
    vecs = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    truth = _brute_pairs(vecs, ids, 0.35)
    assert truth, "threshold too high for the synthetic embeddings"

    got = {
        (r["a"], r["b"])
        for r in embedding_neardup(ds, threshold=0.35, nplanes=3, nbands=12).take_all()
    }
    assert not (got - truth)  # every reported pair is a true pair (verified)
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall:.2f} < 0.9 ({len(got)}/{len(truth)})"


def test_embedding_neardup_bucket_cap(ray_session):
    """Oversize buckets split hierarchically: a tiny cap still returns
    only true pairs and never computes an unbounded all-pairs block."""
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.RandomState(3)
    # one tight cluster (200 near-identical vectors) → one hot LSH bucket
    base = rng.standard_normal(64).astype(np.float32)
    vecs = base + 0.01 * rng.standard_normal((200, 64)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )
    from hikma_engine_ray.stages.dedup_suite import embedding_neardup

    ds = rd.from_arrow(t)
    capped = embedding_neardup(ds, threshold=0.999, nplanes=4, nbands=2,
                               max_bucket=32).take_all()
    truth = _brute_pairs(vecs.astype(np.float64), np.arange(200), 0.999)
    got = {(r["a"], r["b"]) for r in capped}
    assert got <= truth
    assert len(got) > 0


# ------------------------------------- round 3: capped collision groups

def test_capped_pair_indices_kernel():
    """Below the cap: exactly np.triu_indices. Above with identical
    subkeys: star pairs (O(n)). Above with distinct subkeys: bounded
    leaves, pairs ⊆ full set, never more than cap²/2 per leaf."""
    from hikma_engine_ray.stages.dedup_suite import _capped_pair_indices

    # n <= cap → full triu, same order
    keys = np.arange(10, dtype=np.uint64)
    got = list(_capped_pair_indices(keys, cap=16))
    assert len(got) == 1
    ia, ib = np.triu_indices(10, 1)
    assert np.array_equal(got[0][0], ia) and np.array_equal(got[0][1], ib)

    # identical subkeys, n > cap → star (n-1 pairs from position 0)
    keys = np.zeros(1000, dtype=np.uint64)
    pairs = [(int(a), int(b)) for ia, ib in _capped_pair_indices(keys, cap=8)
             for a, b in zip(ia, ib)]
    assert len(pairs) == 999
    assert all(a == 0 and b > 0 for a, b in pairs)

    # distinct subkeys, n > cap → every pair valid (a<b), bounded count
    rng = np.random.RandomState(5)
    keys = rng.randint(0, 2**63, size=200, dtype=np.int64).astype(np.uint64)
    pairs = [(int(a), int(b)) for ia, ib in _capped_pair_indices(keys, cap=16)
             for a, b in zip(ia, ib)]
    assert all(a < b for a, b in pairs)
    assert 0 < len(pairs) < 200 * 199 // 2


def test_popcount64_matches_python():
    from hikma_engine_ray.stages.dedup_suite import _popcount64

    rng = np.random.RandomState(11)
    xs = rng.randint(0, 2**63, size=500, dtype=np.int64).astype(np.uint64)
    xs[:3] = [0, 1, np.iinfo(np.uint64).max]
    got = _popcount64(xs)
    assert [int(g) for g in got] == [bin(int(x)).count("1") for x in xs]


def test_lsh_flood_bounded(ray_session):
    """The round-2 scale-killer: 10k identical + 10k empty docs. Old
    pairs_bucket emitted g²/2 Python pairs per band (≈1.6e9 total);
    capped groups must finish fast, keep identical docs connected
    (star pairing), and emit NOTHING for content-less docs."""
    import time

    import pyarrow as pa
    import ray.data as rd

    from hikma_engine_ray.stages.dedup_suite import (
        minhash_candidates,
        simhash_candidates,
    )

    n = 10_000
    texts = ["license boilerplate text repeated verbatim in every file"] * n + [""] * n
    t = pa.table({"doc_id": pa.array(range(2 * n), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    t0 = time.monotonic()
    mh = minhash_candidates(rd.from_arrow(t), num_perm=64, bands=16, k=3,
                            group_cap=64).take_all()
    sh = simhash_candidates(rd.from_arrow(t), max_hamming=3, group_cap=64).take_all()
    wall = time.monotonic() - t0
    assert wall < 120, f"flood took {wall:.0f}s — group cap not effective"

    for rows in (mh, sh):
        ids = {r["a"] for r in rows} | {r["b"] for r in rows}
        # no empty doc ever appears in a candidate pair
        assert all(i < n for i in ids), "content-less docs entered banding"
        # star pairing keeps the identical-doc flood in ONE component
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in rows:
            parent[find(r["a"])] = find(r["b"])
        assert len({find(i) for i in range(n)}) == 1
        # bounded output: orders of magnitude below g²/2
        assert len(rows) < 5_000_000


def test_verify_jaccard_autoswitch_matches_driver_path(ray_session):
    """A tiny driver_limit forces the joined fallback; results must be
    identical to the broadcast driver path (same pairs, same scores)."""
    from hikma_engine_ray.stages.dedup_suite import (
        minhash_candidates,
        verify_jaccard_pairs,
    )

    ds = _docs(ray_session)
    cand = minhash_candidates(ds, num_perm=64, bands=16, k=3,
                              distinct=False).materialize()
    driver = verify_jaccard_pairs(cand, ds, threshold=0.4, k=3).take_all()
    joined = verify_jaccard_pairs(cand, ds, threshold=0.4, k=3,
                                  driver_limit=1).take_all()
    as_set = lambda rows: {(r["a"], r["b"], round(r["jaccard"], 9)) for r in rows}
    assert as_set(driver) == as_set(joined)
    assert len(driver) > 0
