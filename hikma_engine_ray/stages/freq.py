"""Exact top-k frequent items via the two-pass Misra-Gries reduction.

The heavy-hitter operator for vocabularies too large to shuffle: the
combiner-first ``token_vocab`` (agg-family) shuffles one row per
DISTINCT item per block — at web scale (10⁹+ distinct tokens) that is
still a huge exchange. This operator never shuffles item rows at all:

  pass 1: each block folds its items into a Misra-Gries summary of
          ``capacity`` counters (classic streaming heavy-hitters,
          Misra & Gries 1982). Summaries are mergeable (counter-wise
          add, then decrement-all by the (capacity+1)-th largest) and
          O(capacity) bytes, so the driver merges #blocks summaries.
  pass 2: the merged candidate set (≤ capacity items) is broadcast and
          counted EXACTLY in one streaming pass; top-k by exact count.

Guarantee (standard MG bound): any item with true count
> N/(capacity+1) survives pass 1, so pass-2 top-k is EXACT whenever
the k-th most frequent item has count > N/(capacity+1) — size
``capacity`` ≥ k/ε where the k-th item holds an ε fraction. The
operator cannot silently miss under-threshold ties: it reports
``threshold = N // (capacity + 1)`` so callers can assert
``min(top-k count) > threshold``; below that the result is
best-effort (the documented trade, same as any sketch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _mg_fold(counts: dict[str, int], items, capacity: int) -> None:
    """Fold items into a Misra-Gries counter dict in place."""
    for it in items:
        if it in counts:
            counts[it] += 1
        elif len(counts) < capacity:
            counts[it] = 1
        else:
            # decrement-all; drop zeros (the classic O(1)-amortized step)
            dead = []
            for key in counts:
                counts[key] -= 1
                if counts[key] == 0:
                    dead.append(key)
            for key in dead:
                del counts[key]
    return None


def frequent_items(ds, k: int = 10, capacity: int = 4096,
                   item_fn=None, col: str = "text"):
    """Exact top-``k`` items (see module guarantee). ``item_fn`` maps a
    cell value to an iterable of items (default: lowercase word split);
    pass ``item_fn=lambda v: [v]`` to count whole column values.
    Returns a pandas DataFrame (item, n) ordered by (n desc, item asc),
    plus the guarantee threshold as ``.attrs['threshold']``."""
    import re

    import ray

    tok = re.compile(r"[a-z0-9_]+")
    if item_fn is None:
        def item_fn(v):  # noqa: F811 — default tokenizer
            return tok.findall((v or "").lower())

    _TOTAL = "\x00total"  # sentinel row carrying the block's item count
    # (the default tokenizer can never emit it: \x00 is not [a-z0-9_])

    def summarize(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        n = 0
        for v in batch[col].to_pylist():
            items = list(item_fn(v))
            n += len(items)
            _mg_fold(counts, items, capacity)
        counts[_TOTAL] = n
        return pa.table({
            "item": pa.array(list(counts.keys()), pa.string()),
            "c": pa.array(list(counts.values()), pa.int64()),
        })

    part = ds.map_batches(summarize, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    if "item" not in part.columns or not len(part):
        out = pd.DataFrame({"item": pd.Series([], dtype="object"),
                            "n": pd.Series([], dtype="int64")})
        out.attrs["threshold"] = 0
        return out
    # flat merge (order-free, hence deterministic): sum every partial
    # counter per item, then ONE cut back to capacity — a special case
    # of the mergeable-summaries theorem with a single decrement round,
    # so the N/(capacity+1) guarantee holds a fortiori
    sums = part.groupby("item", sort=False)["c"].sum()
    n_total = int(sums.pop(_TOTAL))
    merged = {str(k_): int(v) for k_, v in sums.items()}
    if len(merged) > capacity:
        cut = sorted(merged.values(), reverse=True)[capacity]
        merged = {k_: v - cut for k_, v in merged.items() if v - cut > 0}
    cand = sorted(merged.keys())
    ref = ray.put(set(cand))

    def exact(batch: pa.Table) -> pa.Table:
        want = ray.get(ref)
        counts: dict[str, int] = {}
        for v in batch[col].to_pylist():
            for it in item_fn(v):
                if it in want:
                    counts[it] = counts.get(it, 0) + 1
        return pa.table({
            "item": pa.array(list(counts.keys()), pa.string()),
            "cnt": pa.array(list(counts.values()), pa.int64()),
        })

    ex = ds.map_batches(exact, batch_format="pyarrow",
                        batch_size=None).to_pandas()
    if "item" not in ex.columns or not len(ex):
        totals = pd.DataFrame({"item": pd.Series([], dtype="object"),
                               "n": pd.Series([], dtype="int64")})
    else:
        totals = (
            ex.groupby("item", sort=False)["cnt"].sum().reset_index()
            .rename(columns={"cnt": "n"})
        )
    totals = totals.sort_values(["n", "item"], ascending=[False, True],
                                kind="stable").head(k).reset_index(drop=True)
    totals["n"] = totals["n"].astype("int64")
    totals.attrs["threshold"] = n_total // (capacity + 1)
    return totals
