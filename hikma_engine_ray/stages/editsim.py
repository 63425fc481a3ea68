"""Exact edit-distance (Levenshtein) similarity SELF-JOIN for short
strings via DELETION NEIGHBORHOODS — the SymSpell candidate scheme
(public algorithm: Garbe's symmetric-delete spelling correction; the
completeness lemma below is folklore in that literature).

The reference engine has no fuzzy string matching at all — this
belongs to the training-data / data-cleaning suite the Ray port adds
as first-class (entity resolution over names, titles, near-identical
metadata values). Unlike the shingle joins in ``setsim.py`` (set
similarity, long documents), this join is EXACT for the edit-distance
relation on SHORT strings (names, titles — the SymSpell domain).

Completeness lemma: if ed(a, b) <= d then there is a string s
obtainable from a by at most d deletions AND from b by at most d
deletions. (Take an optimal alignment; the matched positions spell
the same string in both — a loses its deleted+substituted chars
(<= d of them), b loses its inserted+substituted chars (<= d).)
Hence hashing every <=d-deletion variant and grouping by the hash
surfaces EVERY qualifying pair; the per-pair DP verify removes the
false positives (including 64-bit hash collisions, which can only
ADD candidates).

Scale shape (one shuffle over variant hashes + one dedup shuffle):

  strings --dedup_exact(s)--> distinct strings            [1 shuffle]
          --map_batches--> (h = u64 hash of variant, s)    rows
          --hash-bucket groupby(h)--> candidate pairs (a < b)
          --dedup_exact(a, b)--> distinct candidates       [1 shuffle]
          --map_batches banded-DP verify--> (a, b, dist <= d)

Because the join runs over the DISTINCT-string universe, a corpus
where one name repeats a million times costs one variant set, not a
million — the id-level pair expansion (a cross product per matched
name pair) is the caller's join if wanted.

Partitioning assumptions, documented per the north rule:
  * Variant count per string is O(L^2 / 2) for d = 2 (O(L) for
    d = 1) — this operator targets short-string columns (L <~ 100);
    for long text use the shingle joins in setsim.py instead.
  * A variant group's size is the number of distinct strings within
    edit distance <= 2d of each other that share the variant — the
    candidate graph's natural density. Pair expansion is vectorized
    (np.triu_indices); the verify is O(d * min_len) banded DP per
    DISTINCT candidate pair, never per duplicate occurrence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import BUCKET_COL, add_bucket_column, blocks_for_keys, dedup_exact
from .dedup_suite import _hash_occurrences

_VARIANT_SEED = 29  # any fixed seed; shared by all rows

_VARIANT_SCHEMA = pa.schema([("h", pa.int64()), ("s", pa.string())])


def deletion_variants(s: str, d: int) -> set[str]:
    """All strings reachable from ``s`` by at most ``d`` character
    deletions (including ``s`` itself). |result| <= 1 + L + L(L-1)/2
    for d = 2."""
    out = {s}
    frontier = {s}
    for _ in range(d):
        nxt = set()
        for v in frontier:
            for i in range(len(v)):
                nxt.add(v[:i] + v[i + 1:])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


def variant_rows(d: int, str_col: str = "s"):
    """map_batches fn: distinct strings -> one row per deletion
    variant ``(h, s)``; h is an int64 bit-view of a 64-bit blake2b of
    the variant bytes (int64 on the wire — Ray's sort shuffle pickles
    uint64 key columns, see setsim.py)."""

    def fn(batch: pa.Table) -> pa.Table:
        strs = batch[str_col].to_pylist()
        all_v: list[bytes] = []
        lens = np.empty(len(strs), dtype=np.int64)
        for j, s in enumerate(strs):
            vs = deletion_variants(s or "", d)
            lens[j] = len(vs)
            all_v.extend(v.encode("utf-8") for v in vs)
        h = _hash_occurrences(all_v, _VARIANT_SEED).view(np.int64)
        idx = np.repeat(np.arange(len(strs)), lens)
        return pa.Table.from_arrays(
            [pa.array(h, pa.int64()),
             pa.array(np.asarray(strs, dtype=object)[idx], pa.string())],
            schema=_VARIANT_SCHEMA,
        )

    return fn


def _pairs_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Per-bucket kernel: expand each variant group's candidate pairs
    (a < b, distinct strings), vectorized."""
    g = g[g.duplicated(subset=["h"], keep=False)]
    parts_a: list[np.ndarray] = []
    parts_b: list[np.ndarray] = []
    for _, sub in g.groupby("h", sort=False):
        ss = sub["s"].drop_duplicates().to_numpy(dtype=object)
        if len(ss) < 2:
            continue
        ss = np.sort(ss)
        ia, ib = np.triu_indices(len(ss), k=1)
        parts_a.append(ss[ia])
        parts_b.append(ss[ib])
    a = np.concatenate(parts_a) if parts_a else np.empty(0, object)
    b = np.concatenate(parts_b) if parts_b else np.empty(0, object)
    return pd.DataFrame({"a": pd.Series(a, dtype=object),
                         "b": pd.Series(b, dtype=object)})


def banded_levenshtein(a: str, b: str, d: int) -> int:
    """Levenshtein distance capped at d + 1: classic row DP restricted
    to the |i - j| <= d band (O(d * len) time). Returns the exact
    distance when <= d, else d + 1."""
    la, lb = len(a), len(b)
    if abs(la - lb) > d:
        return d + 1
    if la == 0 or lb == 0:
        return max(la, lb)
    big = d + 1
    prev = np.arange(lb + 1, dtype=np.int64)
    prev[prev > big] = big
    cur = np.empty(lb + 1, dtype=np.int64)
    for i in range(1, la + 1):
        lo = max(1, i - d)
        hi = min(lb, i + d)
        cur[:] = big
        if lo == 1:
            cur[0] = i if i <= big else big
        ai = a[i - 1]
        # vectorize the inner band: substitution then in-band fixups
        seg = slice(lo, hi + 1)
        sub = prev[lo - 1:hi] + np.array(
            [0 if ai == b[j - 1] else 1 for j in range(lo, hi + 1)],
            dtype=np.int64,
        )
        dele = prev[seg] + 1
        cur[seg] = np.minimum(sub, dele)
        # insertions are a left-to-right scan dependency
        for j in range(lo, hi + 1):
            if cur[j - 1] + 1 < cur[j]:
                cur[j] = cur[j - 1] + 1
        if cur[lo:hi + 1].min() > d:
            return d + 1
        prev, cur = cur, prev
    return int(min(prev[lb], big))


def _verify(d: int):
    def fn(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        dist = np.array(
            [banded_levenshtein(x or "", y or "", d) for x, y in zip(a, b)],
            dtype=np.int64,
        )
        keep = dist <= d
        return pa.Table.from_arrays(
            [pa.array(np.asarray(a, object)[keep], pa.string()),
             pa.array(np.asarray(b, object)[keep], pa.string()),
             pa.array(dist[keep], pa.int64())],
            names=["a", "b", "dist"],
        )

    return fn


def edit_distance_self_join(ds, max_dist: int = 2, str_col: str = "s",
                            nbuckets: int = 32):
    """Exact all-pairs (a < b, levenshtein(a, b) <= max_dist) over the
    DISTINCT values of ``str_col``. Returns
    Dataset[(a: string, b: string, dist: int64)]."""
    assert max_dist >= 1
    distinct = dedup_exact(
        ds.map_batches(lambda t: pa.table({"s": t[str_col]}),
                       batch_format="pyarrow"),
        key_cols=["s"], sort_cols=["s"],
    )
    rows = distinct.map_batches(variant_rows(max_dist, "s"),
                                batch_format="pyarrow")
    cand = (
        rows.map_batches(add_bucket_column(["h"], nbuckets),
                         batch_format="pyarrow")
        .repartition(blocks_for_keys(nbuckets))
        .groupby(BUCKET_COL)
        .map_groups(
            lambda g: _pairs_per_bucket(g.drop(columns=[BUCKET_COL])),
            batch_format="pandas",
        )
    )
    cand = dedup_exact(cand, key_cols=["a", "b"], sort_cols=["a", "b"])
    return cand.map_batches(_verify(max_dist), batch_format="pyarrow")
