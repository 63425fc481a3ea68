"""Bloom-filter semi-/anti-join (join-family extension; the classic
distributed semi-join reduction from the database literature).

The RIGHT side's join keys are folded into a fixed-size Bloom bitmap —
per-block partial bitmaps, then the same distributed tree-OR reduce as
the HLL register merge (agg.py) so the driver only ever touches the
root bitmap — which is then ``ray.put`` ONCE and tested inside a
stateless ``map_batches`` over the streaming LEFT side.

A Bloom pass alone is approximate (false-positive rate
≈ (1 - e^{-kn/m})^k); EXACT semantics come from one more pass over the
(bloom-reduced, usually small) survivor set:

  semi_join : bloom-filter left → exact bucketed join vs DISTINCT
              right keys. Misses are true negatives, so the expensive
              shuffle join only sees rows that probably match.
  anti_join : bloom MISSES are definite non-members and pass straight
              through with NO join at all; only bloom HITS (true
              members + the ~FPR sliver) take the exact join, and the
              unmatched remainder is unioned back in.

Scale shape: the left side streams once; the right side is reduced to
distinct keys only for the exact pass; the bitmap is fixed-size
(``num_bits`` default 2^23 = 1 MiB → FPR < 1% up to ~10^6 distinct
right keys at k=7 — size it ~10 bits per expected distinct key)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import dedup_exact

_MARK = "__in_right"


def _key_hashes(batch: pa.Table, on: list[str], seed: int) -> np.ndarray:
    """Vectorized u64 key hash (the joins.py bucket idiom)."""
    import polars as pl
    import pyarrow.compute as pc

    if batch.num_rows == 0:
        return np.empty(0, dtype=np.uint64)
    combined = (
        pc.binary_join_element_wise(
            *[pc.fill_null(pc.cast(batch[c], pa.string()), "None") for c in on],
            "\x1f",
        )
        if len(on) > 1
        else pc.fill_null(pc.cast(batch[on[0]], pa.string()), "None")
    )
    return pl.Series(pl.from_arrow(combined)).hash(seed=seed).to_numpy().astype(np.uint64)


def _positions(h1: np.ndarray, h2: np.ndarray, num_bits: int, k: int) -> np.ndarray:
    """Kirsch–Mitzenmacher double hashing: position_i = h1 + i*h2 mod m.
    Returns (k, n) bit positions."""
    i = np.arange(k, dtype=np.uint64)[:, None]
    return (h1[None, :] + i * h2[None, :]) % np.uint64(num_bits)


def build_bloom(right, on: list[str], num_bits: int = 1 << 23, k: int = 7,
                fanin: int = 32):
    """Right dataset → ObjectRef to the merged Bloom bitmap (np.uint64
    words). Per-block partials; tree-OR reduce (agg.hll_distinct's
    pattern: OR is associative+commutative, any batch grouping is a
    valid tree level); only the root is fetched and broadcast."""
    import ray

    assert num_bits % 64 == 0

    def partial(t: pa.Table) -> pa.Table:
        words = np.zeros(num_bits // 64, dtype=np.uint64)
        h1 = _key_hashes(t, on, seed=1)
        h2 = _key_hashes(t, on, seed=2) | np.uint64(1)  # odd: never degenerate
        pos = _positions(h1, h2, num_bits, k).ravel()
        np.bitwise_or.at(words, pos >> np.uint64(6),
                         np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bits": pa.array([words.tobytes()], pa.binary())})

    def merge_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        stack = np.stack(
            [np.frombuffer(b.as_py(), dtype=np.uint64)
             for b in t["bits"].combine_chunks()]
        )
        return pa.table(
            {"bits": pa.array([np.bitwise_or.reduce(stack, axis=0).tobytes()],
                              pa.binary())}
        )

    bits_ds = right.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).materialize()
    while bits_ds.count() > fanin:
        bits_ds = bits_ds.map_batches(
            merge_rows, batch_format="pyarrow", batch_size=fanin
        ).materialize()
    merged = np.zeros(num_bits // 64, dtype=np.uint64)
    for row in bits_ds.take_all():  # ≤ fanin fixed-size rows
        merged |= np.frombuffer(row["bits"], dtype=np.uint64)
    return ray.put(merged)


def bloom_mask_fn(bitmap_ref, on: list[str], num_bits: int, k: int,
                  keep_hits: bool):
    """map_batches fn filtering rows by Bloom membership. ``ray.get`` of
    the broadcast bitmap is zero-copy plasma shared memory per worker."""
    import ray

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        words = ray.get(bitmap_ref)
        h1 = _key_hashes(t, on, seed=1)
        h2 = _key_hashes(t, on, seed=2) | np.uint64(1)
        pos = _positions(h1, h2, num_bits, k)
        bit = (words[pos >> np.uint64(6)]
               >> (pos & np.uint64(63))) & np.uint64(1)
        hits = bit.all(axis=0)
        return t.filter(pa.array(hits if keep_hits else ~hits))

    return fn


def _distinct_keys(right, on: list[str], nbuckets: int):
    keyed = right.map_batches(
        lambda t: t.select(on), batch_format="pyarrow"
    )
    return dedup_exact(keyed, key_cols=on, nbuckets=nbuckets, sort_cols=on)


def semi_join(left, right, on: list[str], num_bits: int = 1 << 23,
              k: int = 7, nbuckets: int = 32):
    """Rows of ``left`` whose key exists in ``right`` — exact. Bloom
    prunes the definite misses before the shuffle join vs the distinct
    right keys."""
    from .joins import bucketed_join

    ref = build_bloom(right, on, num_bits, k)
    survivors = left.map_batches(
        bloom_mask_fn(ref, on, num_bits, k, keep_hits=True),
        batch_format="pyarrow",
    )
    return bucketed_join(survivors, _distinct_keys(right, on, nbuckets),
                         on=on, nbuckets=nbuckets, how="inner")


def anti_join(left, right, on: list[str], num_bits: int = 1 << 23,
              k: int = 7, nbuckets: int = 32):
    """Rows of ``left`` whose key does NOT exist in ``right`` — exact.
    Bloom misses (the bulk of a selective anti join) bypass the shuffle
    entirely; only hits take the exact join and FPs are recovered."""
    import pyarrow.compute as pc

    from .joins import bucketed_join

    ref = build_bloom(right, on, num_bits, k)
    misses = left.map_batches(
        bloom_mask_fn(ref, on, num_bits, k, keep_hits=False),
        batch_format="pyarrow",
    )
    hits = left.map_batches(
        bloom_mask_fn(ref, on, num_bits, k, keep_hits=True),
        batch_format="pyarrow",
    )
    rkeys = _distinct_keys(right, on, nbuckets).map_batches(
        lambda t: t.append_column(_MARK, pa.array([True] * t.num_rows, pa.bool_())),
        batch_format="pyarrow",
    )
    false_pos = (
        bucketed_join(hits, rkeys, on=on, nbuckets=nbuckets, how="left")
        .map_batches(
            lambda t: t.filter(pc.is_null(t[_MARK])).drop_columns([_MARK]),
            batch_format="pyarrow",
        )
    )
    return misses.union(false_pos)
