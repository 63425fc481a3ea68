"""KLL approximate quantile sketch over a numeric column.

Completes the mergeable-sketch family (HLL → COUNT DISTINCT, Bloom →
membership, Misra-Gries → frequency, KLL → quantiles): the scale path
for percentiles over columns whose distinct-value cardinality makes
the exact value-count histogram (`agg.grouped_quantiles`) a heavy
shuffle. Public algorithm: Karnin, Lang, Liberty, "Optimal quantile
approximation in streams" (FOCS'16) — the standard compactor-stack
formulation with deterministic-offset compaction (rank error ≤
O(1/k) · n with the alternating-offset rule; we gate accuracy in
tests rather than restate constants).

Ray shape: one ``map_batches`` pass folds each block into a sketch
(bytes: ≤ k·levels doubles); the driver merges #blocks sketches.
No shuffle, no sort, value column never leaves its block.

Determinism: compaction keeps even- or odd-indexed items by a
per-level alternating flag instead of a random coin, so the sketch is
a pure function of the (block-partitioned) input and the merge order;
the driver sorts block sketches by their min value before merging.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


class KLL:
    """Compactor-stack sketch; items at level L carry weight 2^L."""

    def __init__(self, k: int = 256):
        self.k = k
        self.levels: list[list[float]] = [[]]
        self.n = 0
        self._flags: list[bool] = [False]

    def _capacity(self, level: int) -> int:
        # geometric decay of capacities toward the top (c = 2/3 rule,
        # floored at 2) — the standard KLL schedule
        depth = len(self.levels) - level - 1
        return max(2, int(self.k * (2.0 / 3.0) ** depth))

    def update(self, v: float) -> None:
        self.levels[0].append(v)
        self.n += 1
        self._compress()

    def update_many(self, vals: np.ndarray) -> None:
        self.levels[0].extend(vals.tolist())
        self.n += int(len(vals))
        self._compress()

    def _compress(self) -> None:
        while True:
            for lvl in range(len(self.levels)):
                if len(self.levels[lvl]) > self._capacity(lvl):
                    buf = sorted(self.levels[lvl])
                    # deterministic alternating offset (no RNG)
                    off = 1 if self._flags[lvl] else 0
                    self._flags[lvl] = not self._flags[lvl]
                    promoted = buf[off::2]
                    self.levels[lvl] = []
                    if lvl + 1 == len(self.levels):
                        self.levels.append([])
                        self._flags.append(False)
                    self.levels[lvl + 1].extend(promoted)
                    break
            else:
                return

    def merge(self, other: "KLL") -> "KLL":
        while len(self.levels) < len(other.levels):
            self.levels.append([])
            self._flags.append(False)
        for lvl, buf in enumerate(other.levels):
            self.levels[lvl].extend(buf)
        self.n += other.n
        self._compress()
        return self

    def quantile(self, q: float) -> float:
        items: list[tuple[float, int]] = []
        for lvl, buf in enumerate(self.levels):
            w = 1 << lvl
            items.extend((v, w) for v in buf)
        if not items:
            return float("nan")
        items.sort()
        total = sum(w for _, w in items)
        target = q * total
        acc = 0
        for v, w in items:
            acc += w
            if acc >= target:
                return v
        return items[-1][0]

    # --- serialization for the Arrow partial rows ---
    def dumps(self) -> bytes:
        import pickle

        return pickle.dumps((self.k, self.n, self.levels, self._flags))

    @classmethod
    def loads(cls, b: bytes) -> "KLL":
        import pickle

        k, n, levels, flags = pickle.loads(b)
        s = cls(k)
        s.n, s.levels, s._flags = n, levels, flags
        return s


def kll_quantiles(ds, col: str, qs: list[float], k: int = 256) -> dict[str, float]:
    """Approximate quantiles of ``ds[col]``: per-block KLL partials,
    driver merge (deterministic order: by each sketch's min value, then
    block row count). Returns {f"q{q}": value}."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64, copy=False)
        vals = vals[~np.isnan(vals)]
        s = KLL(k)
        if len(vals):
            s.update_many(vals)
        lo = float(vals.min()) if len(vals) else float("inf")
        return pa.table({
            "sk": pa.array([s.dumps()], pa.binary()),
            "lo": pa.array([lo], pa.float64()),
            "cnt": pa.array([int(len(vals))], pa.int64()),
        })

    part = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    if "sk" not in part.columns or not len(part):
        return {f"q{q}": float("nan") for q in qs}
    part = part.sort_values(["lo", "cnt"], kind="stable")
    merged = KLL(k)
    for blob in part["sk"]:
        merged.merge(KLL.loads(blob))
    return {f"q{q}": merged.quantile(q) for q in qs}


def grouped_kll_quantiles(ds, value_col: str, group_col: str,
                          qs: list[float], k: int = 256):
    """Approximate quantiles PER GROUP: each block folds the rows of
    every group it sees into one KLL sketch row (group, blob, lo, cnt);
    the groupby reduce merges each group's sketches in a deterministic
    order (lo, cnt — same rule as the global path) and reads the
    quantiles off the merged sketch. Shuffle volume = groups × blocks ×
    sketch bytes (≤ k·levels doubles) — independent of row count; the
    sketch twin of the exact `agg.grouped_quantiles` for columns whose
    distinct-value histogram would be the heavy shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table({
            group_col: pa.array([], batch.schema.field(group_col).type),
            "sk": pa.array([], pa.binary()),
            "lo": pa.array([], pa.float64()),
            "cnt": pa.array([], pa.int64()),
        })
        if batch.num_rows == 0:
            return empty
        # ONE sort + contiguous run slicing (round-3 ADVICE — was
        # filter-per-distinct-group, O(groups × rows) per batch). Null
        # group keys sort last and are skipped explicitly.
        t2 = batch.select([group_col, value_col]).sort_by(
            [(group_col, "ascending")]
        ).combine_chunks()
        keys = t2[group_col].combine_chunks()
        n = len(keys) - keys.null_count
        if n == 0:
            return empty
        keys = keys.slice(0, n)
        allvals = pc.cast(t2[value_col].slice(0, n), pa.float64()).to_numpy(
            zero_copy_only=False
        )
        codes = pc.dictionary_encode(keys).indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        change = np.flatnonzero(np.diff(codes)) + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        ends = np.concatenate([change, [n]]).astype(np.int64)
        blobs, los, cnts = [], [], []
        for s_, e_ in zip(starts, ends):
            vals = allvals[s_:e_]
            vals = vals[~np.isnan(vals)]
            s = KLL(k)
            if len(vals):
                s.update_many(vals)
            blobs.append(s.dumps())
            los.append(float(vals.min()) if len(vals) else float("inf"))
            cnts.append(int(len(vals)))
        return pa.table({
            group_col: keys.take(pa.array(starts)),
            "sk": pa.array(blobs, pa.binary()),
            "lo": pa.array(los, pa.float64()),
            "cnt": pa.array(cnts, pa.int64()),
        })

    def merge(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(["lo", "cnt"], kind="stable")
        merged = KLL(k)
        for blob in df["sk"]:
            merged.merge(KLL.loads(blob))
        out = {group_col: group[group_col][:1]}
        for q in qs:
            out[f"q{int(q * 100)}"] = pa.array(
                [merged.quantile(q)], pa.float64())
        return pa.table(out)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(merge, batch_format="pyarrow")
    )
