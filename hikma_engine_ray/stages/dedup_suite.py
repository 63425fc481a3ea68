"""Deduplication suite for training-data pipelines.

Five families, each expressed Ray-Data-first:

  exact          content-hash → bucketed hash-partition → per-group first
  minhash-LSH    shingle → minhash sig → band rows → groupby(band,hash)
                 → candidate pairs → Jaccard verify
  simhash        64-bit simhash → bucket by 16-bit sub-bands → hamming verify
  ngram-jaccard  direct pair scoring over LSH candidates (verify kernel)
  embedding      random-hyperplane LSH buckets → in-bucket cosine verify

All hashing is deterministic (crc32 / blake2b with fixed seeds — never
Python ``hash()``). Candidate generation shuffles only small signature
rows, never the document text: verification re-reads text for candidate
pairs only via a broadcast lookup (`ray.put` once) at test scale, or a
re-join by doc_id at cluster scale.
"""

from __future__ import annotations

import hashlib
import itertools
import re
import struct
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD = re.compile(r"\S+")


def _stable64(data: bytes, seed: int) -> int:
    h = hashlib.blake2b(data, digest_size=8, key=seed.to_bytes(8, "big"))
    return struct.unpack("<Q", h.digest())[0]


# ------------------------------------------------------------------ exact

def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id", nbuckets: int = 32):
    """Keep the min-id row per exact text match (hash-partition +
    per-group first — the north-rule pattern). Output sorted columns:
    the surviving rows."""
    from .dedup import add_bucket_column, BUCKET_COL

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        hs = [hashlib.md5((t or "").encode("utf-8", "surrogatepass")).hexdigest() for t in texts]
        return batch.append_column("content_md5", pa.array(hs, pa.string()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col], kind="stable")
        g = g.drop_duplicates(subset=["content_md5"], keep="first")
        return g.drop(columns=[BUCKET_COL])

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .map_batches(add_bucket_column(["content_md5"], nbuckets), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(per_bucket, batch_format="pandas")
    )


# ------------------------------------------------------------- shingling

def _shingles(text: str, k: int = 5) -> set[bytes]:
    toks = _WORD.findall(text.lower())
    if len(toks) < k:
        return {(" ".join(toks)).encode()} if toks else set()
    return {(" ".join(toks[i : i + k])).encode() for i in range(len(toks) - k + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


# ---------------------------------------------------------- minhash-LSH

class MinHashSigs:
    """Actor-pool stage: text → minhash signature (num_perm×u64 via
    seeded blake2b) emitted as band rows ``(band, band_hash, doc_id)``.
    Signature parameters are actor state."""

    def __init__(self, num_perm: int = 64, bands: int = 16, k: int = 5,
                 text_col: str = "text", id_col: str = "doc_id"):
        assert num_perm % bands == 0
        self.num_perm, self.bands, self.k = num_perm, bands, k
        self.rows_per_band = num_perm // bands
        self.text_col, self.id_col = text_col, id_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        sig = np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        if not sh:
            return sig
        base = np.fromiter(
            (_stable64(s, 0) for s in sh), dtype=np.uint64, count=len(sh)
        )
        # affine rehash per permutation: (a_i * h + b_i) mod 2^64 — one
        # vectorized op per permutation instead of len(sh) hash calls
        for i in range(self.num_perm):
            a = np.uint64(_A[i])
            b = np.uint64(_B[i])
            sig[i] = (base * a + b).min()
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        out_band, out_hash, out_id = [], [], []
        r = self.rows_per_band
        for t, did in zip(texts, ids):
            sig = self.signature(t or "")
            for b in range(self.bands):
                h = hashlib.blake2b(sig[b * r : (b + 1) * r].tobytes(), digest_size=8).hexdigest()
                out_band.append(b)
                out_hash.append(h)
                out_id.append(did)
        return pa.table(
            {
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.string()),
                "doc_id": pa.array(out_id, pa.int64()),
            }
        )


# fixed odd multipliers / offsets for the affine minhash permutations
_rng = np.random.RandomState(0xC0FFEE)
_A = (_rng.randint(1, 2**63, size=256, dtype=np.int64).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
_B = _rng.randint(0, 2**63, size=256, dtype=np.int64).astype(np.uint64)


def minhash_candidates(ds, num_perm: int = 64, bands: int = 16, k: int = 5,
                       text_col: str = "text", id_col: str = "doc_id"):
    """Documents → candidate near-dup pairs (a < b) via banded LSH.
    The groupby shuffles only (band, hash, id) rows."""

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # only (band, band_hash) groups with a collision can yield pairs —
        # filter them vectorized, loop only over actual collision groups
        g = g[g.duplicated(subset=["band", "band_hash"], keep=False)]
        out_a: list[int] = []
        out_b: list[int] = []
        for _, sub in g.groupby(["band", "band_hash"], sort=False):
            ids = sorted(set(sub["doc_id"].tolist()))
            for x, y in itertools.combinations(ids, 2):
                out_a.append(x)
                out_b.append(y)
        return pd.DataFrame({"a": pd.Series(out_a, dtype="int64"),
                             "b": pd.Series(out_b, dtype="int64")})

    # stateless tasks: the only "state" (permutation coefficients _A/_B)
    # is module-level, so warm Ray workers need no actor spin-up
    sig = MinHashSigs(num_perm, bands, k, text_col, id_col)
    sigs = ds.map_batches(sig.__call__, batch_format="pyarrow")
    from .dedup import BUCKET_COL, add_bucket_column, dedup_exact

    cand = (
        sigs.map_batches(add_bucket_column(["band", "band_hash"], 32), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(
            lambda g: pairs_bucket(g.drop(columns=[BUCKET_COL])),
            batch_format="pandas",
        )
    )
    # distinct pairs (a pair can collide in several bands)
    return dedup_exact(cand, key_cols=["a", "b"], sort_cols=["a", "b"])


def verify_jaccard(pairs_ds, docs_lookup_ref, threshold: float, k: int = 5):
    """Verify candidate pairs with exact n-gram Jaccard. ``docs_lookup_ref``
    is a ``ray.put`` handle to a {doc_id: text} dict (broadcast once,
    fetched per actor — NOT per batch)."""
    import ray

    def verify(batch: pa.Table) -> pa.Table:
        docs = ray.get(docs_lookup_ref)  # zero-copy plasma fetch
        cache: dict[int, set] = {}

        def sh(did: int) -> set:
            s = cache.get(did)
            if s is None:
                s = _shingles(docs.get(did, ""), k)
                cache[did] = s
            return s

        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        sims = [jaccard(sh(x), sh(y)) for x, y in zip(a, b)]
        t = batch.append_column("jaccard", pa.array(sims, pa.float64()))
        return t.filter(pa.array([s >= threshold for s in sims]))

    return pairs_ds.map_batches(verify, batch_format="pyarrow")


# -------------------------------------------------------------- simhash

def simhash64(text: str) -> int:
    toks = _WORD.findall((text or "").lower())
    if not toks:
        return 0
    v = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = _stable64(t.encode(), 7)
        bits = np.unpackbits(np.frombuffer(struct.pack(">Q", h), dtype=np.uint8))
        v += bits.astype(np.int64) * 2 - 1
    bits = (v > 0).astype(np.uint8)
    return int.from_bytes(np.packbits(bits).tobytes(), "big")


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    hs = [simhash64(t) for t in batch[text_col].to_pylist()]
    return batch.append_column(
        "simhash", pa.array([h - (1 << 63) for h in hs], pa.int64())
    )  # shifted into signed range for parquet friendliness


def simhash_candidates(ds, max_hamming: int = 3, text_col: str = "text",
                       id_col: str = "doc_id"):
    """Near-dup candidates: docs sharing any of the four 16-bit sub-bands
    of their simhash (pigeonhole: hamming ≤ 3 ⇒ one band equal), then
    exact hamming verify in-group."""

    def bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        hs = [simhash64(t) for t in batch[text_col].to_pylist()]
        ob, ov, oi, oh = [], [], [], []
        for did, h in zip(ids, hs):
            for b in range(4):
                ob.append(b)
                ov.append((h >> (16 * b)) & 0xFFFF)
                oi.append(did)
                oh.append(h - (1 << 63))
        return pa.table(
            {
                "band": pa.array(ob, pa.int32()),
                "band_val": pa.array(ov, pa.int32()),
                "doc_id": pa.array(oi, pa.int64()),
                "simhash": pa.array(oh, pa.int64()),
            }
        )

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.duplicated(subset=["band", "band_val"], keep=False)]
        out_a, out_b, out_d = [], [], []
        for _, sub in g.groupby(["band", "band_val"], sort=False):
            rows = sorted(set(zip(sub["doc_id"], sub["simhash"])))
            for (ida, ha), (idb, hb) in itertools.combinations(rows, 2):
                d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
                if d <= max_hamming:
                    out_a.append(ida)
                    out_b.append(idb)
                    out_d.append(d)
        return pd.DataFrame(
            {"a": pd.Series(out_a, dtype="int64"),
             "b": pd.Series(out_b, dtype="int64"),
             "hamming": pd.Series(out_d, dtype="int64")}
        )

    from .dedup import BUCKET_COL, add_bucket_column, dedup_exact

    cand = (
        ds.map_batches(bands, batch_format="pyarrow")
        .map_batches(add_bucket_column(["band", "band_val"], 32), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(
            lambda g: pairs_bucket(g.drop(columns=[BUCKET_COL])),
            batch_format="pandas",
        )
    )

    return dedup_exact(cand, key_cols=["a", "b"], sort_cols=["a", "b"])


# ------------------------------------------------- embedding near-dup LSH

def embedding_neardup(ds, threshold: float = 0.95, nplanes: int = 12,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      dim: int = 64, seed: int = 13):
    """Random-hyperplane LSH bucket → in-bucket cosine verify. Scale
    path for embedding near-dup: only same-signature vectors pair up."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((dim, nplanes)).astype(np.float32)

    def bucket(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch[vec_col].to_pylist(), dtype=np.float32)
        ids = batch[id_col].to_pylist()
        if len(ids) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "vec": pa.array([], pa.list_(pa.float32()))})
        signs = (vecs @ planes) > 0
        packed = np.packbits(signs, axis=1).astype(np.int64)
        buckets = np.zeros(len(packed), dtype=np.int64)
        for j in range(packed.shape[1]):
            buckets = (buckets << 8) | packed[:, j]
        return pa.table(
            {
                "bucket": pa.array(buckets, pa.int64()),
                "vec_id": pa.array(ids, pa.int64()),
                "vec": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            }
        )

    pair_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("cosine", pa.float64())]
    )

    def pairs(g: pd.DataFrame) -> pa.Table:
        ids = g["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.asarray([g["vec"].iloc[i] for i in order], dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = mat / norms
        sims = mat @ mat.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        return pa.Table.from_arrays(
            [
                pa.array(ids[ia[keep]].astype(np.int64), pa.int64()),
                pa.array(ids[ib[keep]].astype(np.int64), pa.int64()),
                pa.array(np.round(sims[ia, ib][keep], 6), pa.float64()),
            ],
            schema=pair_schema,
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )
