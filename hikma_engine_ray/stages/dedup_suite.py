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


# Bounded per-worker memo for token/shingle hashes: the hash function
# stays the deterministic keyed blake2b (outputs are byte-identical to
# the per-item path) but each distinct string is hashed once per worker
# instead of once per occurrence — natural-language and code corpora
# repeat tokens heavily, so this removes ~all Python hashing from the
# hot loop. Cleared when it exceeds the cap (simple, scan-free bound).
_HASH_MEMO_CAP = 1_000_000
_hash_memo: dict[tuple[bytes, int], int] = {}


def _stable64_memo(data: bytes, seed: int) -> int:
    key = (data, seed)
    v = _hash_memo.get(key)
    if v is None:
        if len(_hash_memo) >= _HASH_MEMO_CAP:
            _hash_memo.clear()
        v = _hash_memo[key] = _stable64(data, seed)
    return v


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR; numpy<2 has no bitwise_count).
    uint64 wraparound multiply is the standard trick's modulus."""
    x = x.astype(np.uint64, copy=True)
    x -= (x >> np.uint64(1)) & np.uint64(0x5555555555555555)
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def _capped_pair_indices(subkeys: np.ndarray, cap: int):
    """Bounded-work pair enumeration for one LSH collision group.

    Yields ``(ia, ib)`` POSITION pairs (ia < ib) over the caller-sorted
    group. Groups of ≤ ``cap`` members emit every pair via one
    ``np.triu_indices`` (vectorized — no per-pair Python). Larger
    groups split hierarchically on ``subkeys`` bits (high → low, the
    embedding_neardup ``split_pairs`` pattern) so no leaf ever computes
    more than cap² pairs; pairs crossing a split are dropped — the
    documented recall trade for pathological buckets (g near-identical
    boilerplate docs would otherwise emit g²/2 pairs). A leaf whose
    subkeys are exhausted (identical signatures all the way down — a
    true near-identical flood) emits STAR pairs (min-position member ×
    rest): O(g) work that preserves cluster connectivity for downstream
    clustering/verification."""

    def rec(idx: np.ndarray, depth: int):
        n = len(idx)
        if n < 2:
            return
        if n <= cap:
            ia, ib = np.triu_indices(n, 1)
            yield idx[ia], idx[ib]
            return
        if depth >= 64:
            yield np.full(n - 1, idx[0], dtype=np.int64), idx[1:]
            return
        bit = (subkeys[idx] >> np.uint64(63 - depth)) & np.uint64(1)
        for m in (bit == np.uint64(0), bit == np.uint64(1)):
            if m.sum() >= 2:
                yield from rec(idx[m], depth + 1)

    yield from rec(np.arange(len(subkeys), dtype=np.int64), 0)


# reusable per-process slabs for the chunked signature kernels: the
# big intermediates ((rows × num_perm) affine values, (rows × 64) ±1
# bit matrix) are written into a buffer that persists across batches
# in the same Ray worker, instead of a fresh malloc/mmap per batch.
# Bounds peak memory to O(_CHUNK) regardless of batch size AND avoids
# re-faulting hundreds of MB of pages per batch (first-touch cost is
# paid once per worker; on hosts with slow demand paging a per-batch
# 133 MB fresh allocation dominated the whole stage).
_CHUNK = 1 << 14  # segment rows per slab (8 MiB at 64 uint64 cols)
_SCRATCH: dict[tuple[str, int], np.ndarray] = {}


def _scratch_rows(rows: int, cols: int, dtype) -> np.ndarray:
    """A (rows × cols) view of a cached ≥(_CHUNK × cols) slab; rows
    above _CHUNK (a single pathological segment) get a one-off array."""
    if rows > _CHUNK:
        return np.empty((rows, cols), dtype)
    key = (np.dtype(dtype).str, cols)
    buf = _SCRATCH.get(key)
    if buf is None:
        buf = np.empty((_CHUNK, cols), dtype)
        _SCRATCH[key] = buf
    return buf[:rows]


def _doc_chunks(lens: np.ndarray):
    """Yield ``(d0, d1, r0, r1)`` doc-aligned chunks whose row span
    ``r1-r0`` stays ≤ _CHUNK (single oversize docs get their own
    chunk). Empty docs contribute no rows and ride along for free."""
    ends = np.cumsum(lens)
    starts = ends - lens
    n = len(lens)
    d0 = 0
    while d0 < n:
        r0 = starts[d0]
        d1 = int(np.searchsorted(ends, r0 + _CHUNK, side="right"))
        d1 = max(d1, d0 + 1)
        yield d0, d1, int(r0), int(ends[d1 - 1])
        d0 = d1


def _hash_occurrences(items: list[bytes], seed: int) -> np.ndarray:
    """Vectorized-by-uniqueness hashing: hash each DISTINCT item once,
    then scatter back to occurrence order. Same values as mapping
    ``_stable64`` over ``items``."""
    if not items:
        return np.empty(0, dtype=np.uint64)
    arr = np.asarray(items, dtype=object)
    # hash-based uniquing (factorize) beats sort-based np.unique on strings
    inv, uniq = pd.factorize(arr)
    hu = np.fromiter(
        (_stable64_memo(u, seed) for u in uniq), dtype=np.uint64, count=len(uniq)
    )
    return hu[inv]


# ------------------------------------------------------------------ exact

def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id", nbuckets: int = 32):
    """Keep the min-id row per exact text match (hash-partition +
    per-group first — the north-rule pattern). Output sorted columns:
    the surviving rows."""
    from .dedup import add_bucket_column, blocks_for_keys, BUCKET_COL

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
        .repartition(blocks_for_keys(nbuckets))
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
        return self.signatures([text])[0]

    def signatures(self, texts: list[str]) -> np.ndarray:
        """Batch minhash: shingle every doc, hash each DISTINCT shingle
        once (seeded blake2b — value-identical to the per-item path),
        apply the affine permutations as (shingle-rows × num_perm)
        uint64 matrix ops in doc-aligned _CHUNK slabs written into a
        reused per-process scratch (value-identical to one giant matrix
        — wraparound arithmetic is per-element), and take per-doc column
        minima via ``np.minimum.reduceat`` per slab. No per-shingle
        Python in the hot loop; peak memory O(_CHUNK × num_perm)."""
        n = len(texts)
        all_sh: list[bytes] = []
        lens = np.empty(n, dtype=np.int64)
        for j, t in enumerate(texts):
            sh = _shingles(t or "", self.k)
            lens[j] = len(sh)
            all_sh.extend(sh)
        sigs = np.full(
            (n, self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64
        )
        if all_sh:
            base = _hash_occurrences(all_sh, 0)
            ends = np.cumsum(lens)
            starts = ends - lens
            for d0, d1, r0, r1 in _doc_chunks(lens):
                ne = np.flatnonzero(lens[d0:d1] > 0) + d0
                if not len(ne):
                    continue
                v = _scratch_rows(r1 - r0, self.num_perm, np.uint64)
                # (a_i * h + b_i) mod 2^64 — uint64 wraparound is the modulus
                np.multiply(
                    base[r0:r1, None], _A[None, : self.num_perm], out=v
                )
                v += _B[None, : self.num_perm]
                sigs[ne] = np.minimum.reduceat(v, starts[ne] - r0, axis=0)
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        sigs = self.signatures(texts)
        # shingle-less docs (empty / sub-k-token text) short-circuit out
        # of banding: their all-max signature would put EVERY empty doc
        # in the same bucket of every band (an unbounded collision
        # group). Content-less docs are exact duplicates of each other —
        # the exact-dedup family's job, not near-dup LSH's.
        nonempty = ~(sigs == np.iinfo(np.uint64).max).all(axis=1)
        sigs, ids = sigs[nonempty], ids[nonempty]
        n = len(ids)
        r = self.rows_per_band
        # band hashes: bands×docs blake2b calls (not shingles×perms)
        out_hash = [
            hashlib.blake2b(sigs[j, b * r : (b + 1) * r].tobytes(), digest_size=8).hexdigest()
            for j in range(n)
            for b in range(self.bands)
        ]
        # full-signature hash: the sub-split key for oversize collision
        # groups (_capped_pair_indices) — 64 bits of discrimination that
        # agree exactly when the whole signature agrees
        sig_hash = np.fromiter(
            (
                struct.unpack(
                    "<q", hashlib.blake2b(sigs[j].tobytes(), digest_size=8).digest()
                )[0]
                for j in range(n)
            ),
            dtype=np.int64,
            count=n,
        )
        return pa.table(
            {
                "band": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n), pa.int32()
                ),
                "band_hash": pa.array(out_hash, pa.string()),
                "doc_id": pa.array(np.repeat(ids, self.bands), pa.int64()),
                "sig_hash": pa.array(np.repeat(sig_hash, self.bands), pa.int64()),
            }
        )


# fixed odd multipliers / offsets for the affine minhash permutations
_rng = np.random.RandomState(0xC0FFEE)
_A = (_rng.randint(1, 2**63, size=256, dtype=np.int64).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
_B = _rng.randint(0, 2**63, size=256, dtype=np.int64).astype(np.uint64)


def minhash_candidates(ds, num_perm: int = 64, bands: int = 16, k: int = 5,
                       text_col: str = "text", id_col: str = "doc_id",
                       distinct: bool = True, group_cap: int = 512):
    """Documents → candidate near-dup pairs (a < b) via banded LSH.
    The groupby shuffles only (band, hash, id, sig_hash) rows.

    ``group_cap`` bounds per-(band, band_hash) collision-group work:
    groups under the cap emit all pairs vectorized (np.triu_indices —
    identical pairs, identical order, to the old combinations loop);
    oversize groups sub-split hierarchically on full-signature-hash
    bits and near-identical floods degrade to star pairing (see
    ``_capped_pair_indices``) — never O(g²) Python."""

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # only (band, band_hash) groups with a collision can yield pairs —
        # filter them vectorized, loop only over actual collision groups
        g = g[g.duplicated(subset=["band", "band_hash"], keep=False)]
        parts_a: list[np.ndarray] = []
        parts_b: list[np.ndarray] = []
        for _, sub in g.groupby(["band", "band_hash"], sort=False):
            sub = sub.drop_duplicates(subset=["doc_id"])
            ids = sub["doc_id"].to_numpy(dtype=np.int64)
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            keys = sub["sig_hash"].to_numpy(dtype=np.int64)[order].view(np.uint64)
            for ia, ib in _capped_pair_indices(keys, group_cap):
                parts_a.append(ids[ia])
                parts_b.append(ids[ib])
        a = np.concatenate(parts_a) if parts_a else np.empty(0, np.int64)
        b = np.concatenate(parts_b) if parts_b else np.empty(0, np.int64)
        return pd.DataFrame({"a": pd.Series(a, dtype="int64"),
                             "b": pd.Series(b, dtype="int64")})

    # stateless tasks: the only "state" (permutation coefficients _A/_B)
    # is module-level, so warm Ray workers need no actor spin-up
    sig = MinHashSigs(num_perm, bands, k, text_col, id_col)
    sigs = ds.map_batches(sig.__call__, batch_format="pyarrow")
    from .dedup import BUCKET_COL, add_bucket_column, blocks_for_keys, dedup_exact

    cand = (
        sigs.map_batches(add_bucket_column(["band", "band_hash"], 32), batch_format="pyarrow")
        .repartition(blocks_for_keys(32))
        .groupby(BUCKET_COL)
        .map_groups(
            lambda g: pairs_bucket(g.drop(columns=[BUCKET_COL])),
            batch_format="pandas",
        )
    )
    if not distinct:
        # caller dedups (e.g. verify_jaccard_pairs does it driver-side on
        # the result-sized pair list) — skips a whole sort shuffle
        return cand
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


_VERIFIED_PAIR_SCHEMA = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]
)


def verify_jaccard_pairs(pairs_ds, docs_ds, threshold: float, k: int = 5,
                         text_col: str = "text", id_col: str = "doc_id",
                         nbuckets: int = 16, driver_limit: int = 2_000_000):
    """Broadcast-small-side verification: the CANDIDATE PAIR SET
    (usually result-sized) is broadcast via ray.put; one streaming pass
    over the documents emits (pair, side, text) rows for participating
    docs only, and ONE shuffle brings each pair's two texts together
    for the exact Jaccard kernel. The corpus is never materialized
    anywhere — contrast verify_jaccard (broadcasts all docs; test-scale
    only) and verify_jaccard_joined (2 shuffle joins).

    LSH candidates have no hard size guarantee on skewed corpora, so
    past ``driver_limit`` candidate rows this AUTO-SWITCHES to the
    fully distributed ``verify_jaccard_joined`` path (the same
    count-guard pattern as ``components.dedup_clusters``) instead of
    ``take_all()``-ing an unbounded pair set onto the driver."""
    import ray

    # cheap count first (pairs are tiny (a, b) rows; the candidate
    # pipeline runs once — materialized so the chosen path reuses it)
    pairs_ds = pairs_ds.materialize()
    from .dedup import blocks_for_keys

    if pairs_ds.count() > driver_limit:
        from .dedup import dedup_exact

        distinct_pairs = dedup_exact(
            pairs_ds.select_columns(["a", "b"]),
            key_cols=["a", "b"], sort_cols=["a", "b"],
        )
        return verify_jaccard_joined(
            distinct_pairs, docs_ds, threshold, k=k,
            text_col=text_col, id_col=id_col,
        )

    # driver-side distinct on the result-sized pair list (a pair can
    # collide in several LSH bands) — cheaper than a distinct shuffle
    pair_set = sorted({(r["a"], r["b"]) for r in pairs_ds.take_all()})
    arr_a = np.fromiter((p[0] for p in pair_set), dtype=np.int64, count=len(pair_set))
    arr_b = np.fromiter((p[1] for p in pair_set), dtype=np.int64, count=len(pair_set))
    # the driver knows the exact pair count — size the verify shuffle so
    # no bucket is empty (empty sort partitions emit schema-less blocks
    # that only produce Ray warnings, and tiny inputs don't need 16-way)
    nbuckets = max(1, min(nbuckets, (len(pair_set) + 7) // 8))
    doc_to_pairs: dict[int, list[tuple[int, int]]] = {}
    for i, (a, b) in enumerate(pair_set):
        doc_to_pairs.setdefault(a, []).append((i, 0))
        doc_to_pairs.setdefault(b, []).append((i, 1))
    ref = ray.put(doc_to_pairs)
    # pair endpoints as numpy arrays in plasma (zero-copy ray.get) —
    # NOT captured in the score closure, which would cloudpickle the
    # whole list into every group task (round-2 ADVICE)
    pairs_ref = ray.put((arr_a, arr_b))

    def emit(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)  # zero-copy plasma fetch, once per worker
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        pid, side, txt = [], [], []
        for did, t in zip(ids, texts):
            for p, s in m.get(did, ()):
                pid.append(p)
                side.append(s)
                txt.append(t)
        return pa.table(
            {
                "pair": pa.array(pid, pa.int64()),
                "side": pa.array(side, pa.int32()),
                "text": pa.array(txt, pa.string()),
                "__b": pa.array([p % nbuckets for p in pid], pa.int32()),
            }
        )

    def score(g: pd.DataFrame) -> pa.Table:
        pa_ids, pb_ids = ray.get(pairs_ref)  # zero-copy plasma fetch
        cache: dict[str, set] = {}

        def sh(t):
            s = cache.get(t)
            if s is None:
                s = cache[t] = _shingles(t or "", k)
            return s

        out_a, out_b, out_j = [], [], []
        for p, sub in g.groupby("pair", sort=True):
            texts = dict(zip(sub["side"], sub["text"]))
            j = jaccard(sh(texts.get(0, "")), sh(texts.get(1, "")))
            if j >= threshold:
                out_a.append(int(pa_ids[int(p)]))
                out_b.append(int(pb_ids[int(p)]))
                out_j.append(j)
        return pa.Table.from_arrays(
            [pa.array(out_a, pa.int64()), pa.array(out_b, pa.int64()),
             pa.array(out_j, pa.float64())],
            schema=_VERIFIED_PAIR_SCHEMA,
        )

    return (
        docs_ds.map_batches(emit, batch_format="pyarrow")
        .repartition(blocks_for_keys(nbuckets))
        .groupby("__b")
        .map_groups(score, batch_format="pandas")
    )


def verify_jaccard_joined(pairs_ds, docs_ds, threshold: float, k: int = 5,
                          text_col: str = "text", id_col: str = "doc_id",
                          nbuckets: int = 32):
    """Scale path for candidate verification: re-join the (small) pair
    set against the documents table by doc_id — twice, for each pair
    side — via the bucketed hash join, then run the shingle/Jaccard
    kernel per batch. NO driver-side corpus materialization and no
    broadcast of the whole corpus (cf. ``verify_jaccard``, which is the
    test-scale broadcast variant). Returns the same (a, b, jaccard)
    rows for pairs meeting the threshold."""
    from .joins import bucketed_join

    docs_a = docs_ds.map_batches(
        lambda t: pa.table({"a": t[id_col], "text_a": t[text_col]}),
        batch_format="pyarrow",
    )
    docs_b = docs_ds.map_batches(
        lambda t: pa.table({"b": t[id_col], "text_b": t[text_col]}),
        batch_format="pyarrow",
    )
    # pin the (tiny) pair sets at the join boundaries: bucketed_join
    # inspects its inputs' schemas, which on a lazy sort-backed pipeline
    # triggers a partial execution — without the pin the candidate
    # pipeline would run several times over (measured 4× wall)
    pairs_ds = pairs_ds.materialize()
    joined = bucketed_join(pairs_ds, docs_a, on=["a"], nbuckets=nbuckets).materialize()
    joined = bucketed_join(joined, docs_b, on=["b"], nbuckets=nbuckets)

    def verify(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        ta = batch["text_a"].to_pylist()
        tb = batch["text_b"].to_pylist()
        cache: dict[int, set] = {}

        def sh(did, text):
            s = cache.get(did)
            if s is None:
                s = cache[did] = _shingles(text or "", k)
            return s

        sims = [jaccard(sh(x, tx), sh(y, ty)) for x, y, tx, ty in zip(a, b, ta, tb)]
        keep = [s >= threshold for s in sims]
        t = pa.Table.from_arrays(
            [
                pa.array(a, pa.int64()),
                pa.array(b, pa.int64()),
                pa.array(sims, pa.float64()),
            ],
            schema=_VERIFIED_PAIR_SCHEMA,
        )
        return t.filter(pa.array(keep))

    return joined.map_batches(verify, batch_format="pyarrow")


# -------------------------------------------------------------- simhash

def simhash64_batch(texts: list[str]) -> np.ndarray:
    """Batch simhash (uint64 per text): tokenize all docs, hash each
    DISTINCT token once (seeded blake2b — value-identical to the old
    per-token path), unpack to a ±1 bit matrix in doc-aligned _CHUNK
    slabs over a reused per-process scratch, and segment-sum per doc
    with ``np.add.reduceat`` per slab. Empty text → 0."""
    n = len(texts)
    all_toks: list[bytes] = []
    lens = np.empty(n, dtype=np.int64)
    for j, t in enumerate(texts):
        toks = _WORD.findall((t or "").lower())
        lens[j] = len(toks)
        all_toks.extend(tok.encode() for tok in toks)
    out = np.zeros(n, dtype=np.uint64)
    if not all_toks:
        return out
    h = _hash_occurrences(all_toks, 7)
    ends = np.cumsum(lens)
    starts = ends - lens
    for d0, d1, r0, r1 in _doc_chunks(lens):
        ne = np.flatnonzero(lens[d0:d1] > 0) + d0
        if not len(ne):
            continue
        # big-endian byte view so bit order matches struct.pack(">Q")+unpackbits
        byts = np.frombuffer(
            h[r0:r1].astype(">u8").tobytes(), dtype=np.uint8
        ).reshape(-1, 8)
        bits = _scratch_rows(r1 - r0, 64, np.int32)
        np.multiply(np.unpackbits(byts, axis=1), 2, out=bits, casting="unsafe")
        bits -= 1
        sums = np.add.reduceat(bits, starts[ne] - r0, axis=0)
        packed = np.packbits((sums > 0).astype(np.uint8), axis=1)
        vals = np.zeros(len(ne), dtype=np.uint64)
        for j in range(8):
            vals = (vals << np.uint64(8)) | packed[:, j].astype(np.uint64)
        out[ne] = vals
    return out


def _simhash_signed(vals: np.ndarray) -> np.ndarray:
    """uint64 simhash → int64 shifted by 2^63 (parquet-friendly signed
    range; identical to Python's ``h - (1 << 63)``)."""
    return (vals ^ np.uint64(1 << 63)).view(np.int64)


def simhash64(text: str) -> int:
    return int(simhash64_batch([text])[0])


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    hs = simhash64_batch(batch[text_col].to_pylist())
    return batch.append_column("simhash", pa.array(_simhash_signed(hs), pa.int64()))


def _simhash_band_layout(max_hamming: int) -> list[tuple[int, int]]:
    """(shift, width) per sub-band: ``max_hamming + 1`` near-equal bands
    over the 64 bits, so by pigeonhole any pair with hamming ≤
    max_hamming shares at least one whole band (the r1 fixed 4×16-bit
    layout only guaranteed hamming ≤ 3 regardless of the parameter)."""
    nb = max(1, min(64, max_hamming + 1))
    base, rem = divmod(64, nb)
    layout, shift = [], 0
    for b in range(nb):
        w = base + (1 if b < rem else 0)
        layout.append((shift, w))
        shift += w
    return layout


def simhash_candidates(ds, max_hamming: int = 3, text_col: str = "text",
                       id_col: str = "doc_id", group_cap: int = 512):
    """Near-dup candidates: docs sharing any sub-band of their simhash
    (band count derived from ``max_hamming`` so the pigeonhole guarantee
    actually covers the requested radius), then exact hamming verify
    in-group — vectorized (popcount over triu index pairs) and bounded
    per collision group by ``group_cap`` (see ``_capped_pair_indices``;
    the sub-split key is the simhash itself)."""
    layout = _simhash_band_layout(max_hamming)

    def bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        texts = batch[text_col].to_pylist()
        hs = simhash64_batch(texts)
        # token-less docs short-circuit out of banding (they'd all share
        # simhash 0 in every band — an unbounded collision group; exact
        # dedup owns content-less duplicates)
        has_tok = np.fromiter(
            (bool(_WORD.search(t or "")) for t in texts), dtype=bool, count=len(texts)
        )
        ids, hs = ids[has_tok], hs[has_tok]
        n = len(ids)
        nb = len(layout)
        ob = np.tile(np.arange(nb, dtype=np.int32), n)
        ov = np.empty(n * nb, dtype=np.int64)
        for b, (shift, width) in enumerate(layout):
            ov[b::nb] = (
                (hs >> np.uint64(shift)) & np.uint64((1 << width) - 1)
            ).astype(np.int64)
        return pa.table(
            {
                "band": pa.array(ob, pa.int32()),
                "band_val": pa.array(ov, pa.int64()),
                "doc_id": pa.array(np.repeat(ids, nb), pa.int64()),
                "simhash": pa.array(np.repeat(_simhash_signed(hs), nb), pa.int64()),
            }
        )

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.duplicated(subset=["band", "band_val"], keep=False)]
        parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        for _, sub in g.groupby(["band", "band_val"], sort=False):
            sub = sub.drop_duplicates(subset=["doc_id", "simhash"])
            ids = sub["doc_id"].to_numpy(dtype=np.int64)
            hs = sub["simhash"].to_numpy(dtype=np.int64)
            order = np.lexsort((hs, ids))
            ids, hs = ids[order], hs[order]
            # XOR of the sign-shifted int64 views equals XOR of the raw
            # simhashes (the 2^63 masks cancel), so hamming is exact
            hu = hs.view(np.uint64)
            for ia, ib in _capped_pair_indices(hu, group_cap):
                d = _popcount64(hu[ia] ^ hu[ib])
                keep = d <= max_hamming
                parts.append((ids[ia][keep], ids[ib][keep], d[keep]))
        if parts:
            a = np.concatenate([p[0] for p in parts])
            b = np.concatenate([p[1] for p in parts])
            dd = np.concatenate([p[2] for p in parts])
        else:
            a = b = dd = np.empty(0, np.int64)
        return pd.DataFrame(
            {"a": pd.Series(a, dtype="int64"),
             "b": pd.Series(b, dtype="int64"),
             "hamming": pd.Series(dd, dtype="int64")}
        )

    from .dedup import BUCKET_COL, add_bucket_column, blocks_for_keys, dedup_exact

    cand = (
        ds.map_batches(bands, batch_format="pyarrow")
        .map_batches(add_bucket_column(["band", "band_val"], 32), batch_format="pyarrow")
        .repartition(blocks_for_keys(32))
        .groupby(BUCKET_COL)
        .map_groups(
            lambda g: pairs_bucket(g.drop(columns=[BUCKET_COL])),
            batch_format="pandas",
        )
    )

    return dedup_exact(cand, key_cols=["a", "b"], sort_cols=["a", "b"])


# ------------------------------------------------- embedding near-dup LSH

_EMBED_BUCKET_SCHEMA = pa.schema(
    [("bucket", pa.int64()), ("vec_id", pa.int64()), ("vec", pa.list_(pa.float32()))]
)
_EMBED_PAIR_SCHEMA = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("cosine", pa.float64())]
)


def embedding_neardup(ds, threshold: float = 0.95, nplanes: int = 8,
                      nbands: int = 6, vec_col: str = "embedding",
                      id_col: str = "vec_id", dim: int = 64, seed: int = 13,
                      max_bucket: int = 4096):
    """Multi-band random-hyperplane LSH → in-bucket cosine verify →
    distinct pairs across bands.

    Scale levers (the r1 version had a single signature and unbounded
    buckets — O(n²) inside one hot bucket):
      * ``nbands`` independent plane sets: a near-dup pair is found if
        it agrees in ANY band (recall compounds like minhash banding).
        Size to the threshold: p_plane = 1 - arccos(threshold)/π,
        recall ≈ 1 - (1 - p_plane^nplanes)^nbands — low thresholds need
        SHORT bands and MANY of them (e.g. 3×12 for cosine 0.35),
        high thresholds tolerate longer bands (8×6 for 0.95).
      * oversize buckets (> ``max_bucket``) split hierarchically by
        extra hyperplane bits before the all-pairs matmul, so no group
        ever computes more than max_bucket² similarities.
      * the shuffle carries only (bucket, id, vec) rows; pairs are
        deduped with the bucketed exact-dedup (a pair can collide in
        several bands)."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((nbands, dim, nplanes)).astype(np.float32)
    # extra planes for splitting oversize buckets (depth-bounded)
    split_planes = rng.standard_normal((dim, 24)).astype(np.float32)

    def bucket(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        if len(ids) == 0:
            return _EMBED_BUCKET_SCHEMA.empty_table()
        from .similarity import _to_matrix

        vecs = _to_matrix(batch[vec_col])
        out_bucket = np.empty(len(ids) * nbands, dtype=np.int64)
        for b in range(nbands):
            signs = (vecs @ planes[b]) > 0
            sig = np.zeros(len(ids), dtype=np.int64)
            for j in range(signs.shape[1]):
                sig = (sig << 1) | signs[:, j]
            # band id in the high bits so bands never collide
            out_bucket[b::nbands] = (np.int64(b) << np.int64(56)) | sig
        vec_list = pa.array([v.tolist() for v in vecs], pa.list_(pa.float32()))
        return pa.Table.from_arrays(
            [
                pa.array(out_bucket, pa.int64()),
                pa.array(np.repeat(ids, nbands), pa.int64()),
                _repeat_list_array(vec_list, nbands),
            ],
            schema=_EMBED_BUCKET_SCHEMA,
        )

    def all_pairs(ids: np.ndarray, mat: np.ndarray) -> list[pa.Table]:
        sims = mat @ mat.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        return [
            pa.Table.from_arrays(
                [
                    pa.array(ids[ia[keep]].astype(np.int64), pa.int64()),
                    pa.array(ids[ib[keep]].astype(np.int64), pa.int64()),
                    pa.array(np.round(sims[ia, ib][keep], 6), pa.float64()),
                ],
                schema=_EMBED_PAIR_SCHEMA,
            )
        ]

    def split_pairs(ids, mat, raw, depth: int) -> list[pa.Table]:
        if len(ids) <= max_bucket or depth >= split_planes.shape[1]:
            return all_pairs(ids, mat)
        side = (raw @ split_planes[:, depth]) > 0
        out = []
        for mask in (side, ~side):
            if mask.sum() > 1:
                out.extend(split_pairs(ids[mask], mat[mask], raw[mask], depth + 1))
        return out

    def pairs(g: pd.DataFrame) -> pa.Table:
        ids = g["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        raw = np.asarray([g["vec"].iloc[i] for i in order], dtype=np.float64)
        norms = np.linalg.norm(raw, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = raw / norms
        tables = split_pairs(ids, mat, raw.astype(np.float32), 0)
        return (
            pa.concat_tables(tables) if tables else _EMBED_PAIR_SCHEMA.empty_table()
        )

    from .dedup import blocks_for_keys

    cand = (
        ds.map_batches(bucket, batch_format="pyarrow")
        # key cardinality: nbands bands x 2^nplanes signatures (capped)
        .repartition(min(64, blocks_for_keys(nbands << nplanes)))
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )
    return dedup_exact_pairs(cand)


def dedup_exact_pairs(cand):
    from .dedup import dedup_exact

    return dedup_exact(cand, key_cols=["a", "b"], sort_cols=["a", "b"])


def _repeat_list_array(arr: pa.Array, times: int) -> pa.Array:
    """Repeat each element of a list array ``times`` times, interleaved
    (row i → positions i*times..i*times+times-1)."""
    idx = np.repeat(np.arange(len(arr), dtype=np.int64), times)
    return arr.take(pa.array(idx))


def dedup_delta(new_ds, index_ds, text_col: str = "text",
                id_col: str = "doc_id", hash_col: str = "content_md5",
                nbuckets: int = 32):
    """Incremental corpus hygiene: dedup a DELTA batch of documents
    against a persisted fingerprint index from prior runs (the
    batch-over-delta pattern — state/delta.py owns the watermarking,
    this owns the dedup semantics).

    Two stages, both scale-shaped:
      1. exact_dedup WITHIN the delta (min-id per content hash — the
         delta can self-duplicate);
      2. bloom ``anti_join`` of the survivors against the index's hash
         column: index hashes fold into a fixed-size bitmap (tree-OR
         reduce, broadcast once), definite-new docs stream through with
         no join, and only bloom hits pay the exact bucketed join that
         recovers false positives.

    Returns the surviving (id, hash) rows — the set to append to the
    index and admit to the corpus. The index side is never collected:
    at 100 TB it is a partitioned Parquet dataset of hashes and only
    its bitmap (fixed ``num_bits``) and its distinct keys for the
    hit-sliver join ever move."""
    from .bloom import anti_join

    survivors = exact_dedup(new_ds, text_col=text_col, id_col=id_col,
                            nbuckets=nbuckets).select_columns(
        [id_col, hash_col]
    )
    index_keys = index_ds.select_columns([hash_col])
    return anti_join(survivors, index_keys, on=[hash_col],
                     nbuckets=nbuckets)
