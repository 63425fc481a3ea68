"""Distributed SKYLINE (Pareto frontier) — the multi-criteria
"best tradeoffs" query (public algorithm family: Börzsönyi, Kossmann,
Stocker, ICDE 2001 "The Skyline Operator"; the two-phase distributed
shape is the standard local-skyline-then-merge plan).

A row is in the skyline iff no other row is >= in every criterion and
> in at least one (strict Pareto dominance; duplicates of a frontier
point all survive). Minimized criteria are negated on entry.

Shape (one streaming pass + one candidate-sized pass):

  rows --map_batches local skyline--> per-block candidates
       --repartition(1) + local skyline--> exact global frontier

Correctness: dominance is transitive, so the global skyline is a
subset of every block's local skyline — the union of local skylines
is a sound candidate set, and one exact pass over it finishes.
PARTITIONING ASSUMPTION (documented per the north rule): the candidate
union fits one block. Real skylines are tiny relative to the corpus
(O(log^{d-1} n) for independent dims); an adversarial corpus that IS
its own frontier degrades to a single-block pass — pre-filter with a
coarser dominance grid upstream if that shape is expected."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _local_skyline_idx(m: np.ndarray) -> np.ndarray:
    """Indices of the non-dominated rows of m (all dims maximized).
    O(n · |skyline|): rows visited in coordinate-sum-descending order
    (a dominator always precedes its victims), each checked against
    the accumulated frontier, vectorized."""
    n = m.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    order = np.argsort(-m.sum(axis=1), kind="stable")
    keep: list[int] = []
    sky = np.empty((0, m.shape[1]), dtype=m.dtype)
    for i in order:
        v = m[i]
        if sky.shape[0]:
            dom = (sky >= v).all(axis=1) & (sky > v).any(axis=1)
            if dom.any():
                continue
        keep.append(int(i))
        sky = np.vstack([sky, v[None, :]])
    return np.sort(np.asarray(keep, dtype=np.int64))


def skyline(ds, value_cols: list[str], maximize: list[bool] | None = None):
    """Dataset → its exact Pareto frontier over ``value_cols``
    (every input column passes through)."""
    if maximize is None:
        maximize = [True] * len(value_cols)
    assert len(maximize) == len(value_cols)
    signs = np.array([1.0 if mx else -1.0 for mx in maximize])

    def local(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return t
        m = np.column_stack([
            pc.cast(t[c], pa.float64()).to_numpy(zero_copy_only=False)
            for c in value_cols
        ]) * signs
        return t.take(pa.array(_local_skyline_idx(m), pa.int64()))

    cand = ds.map_batches(local, batch_format="pyarrow")
    # exact finish over the candidate union in ONE block (assumption
    # documented above)
    return cand.repartition(1).map_batches(local, batch_format="pyarrow")
