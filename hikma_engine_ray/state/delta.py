"""Incremental indexing = batch-over-delta (SURVEY.md §2.9).

The reference stores the last indexed commit in an ``indexing_state``
table and re-indexes only files changed since
(git-analyzer.ts:109-132, IndexingStrategy.ts:15-79,
connection.ts:262-285). The Ray analog: a watermark file records the
(repo, commit) pairs already folded into the outputs; a delta build
filters the corpus to unseen pairs (broadcast membership check inside
``map_batches`` — a semi-join against a small set) and appends to the
partitioned outputs. Content-addressed ids make the append idempotent.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc


def load_watermarks(state_path: str) -> set[tuple[str, str]]:
    if not os.path.exists(state_path):
        return set()
    with open(state_path) as f:
        return {tuple(x) for x in json.load(f)["indexed"]}


def save_watermarks(state_path: str, indexed: set[tuple[str, str]]) -> None:
    os.makedirs(os.path.dirname(state_path) or ".", exist_ok=True)
    tmp = state_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"indexed": sorted(list(x) for x in indexed)}, f)
    os.replace(tmp, state_path)


def corpus_delta(corpus_ds, indexed: set[tuple[str, str]]):
    """Rows whose (repo, commit) is not yet indexed. The watermark set is
    broadcast once; the filter is a vectorized membership test on the
    concatenated key (no shuffle)."""
    import ray

    keys = pa.array([f"{r}\x1f{c}" for r, c in sorted(indexed)], pa.string())
    ref = ray.put(keys)

    def fn(t: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        key = pc.binary_join_element_wise(t["repo"], t["commit"], "\x1f")
        return t.filter(pc.invert(pc.is_in(key, value_set=ks)))

    return corpus_ds.map_batches(fn, batch_format="pyarrow")


def commits_of(corpus_ds) -> set[tuple[str, str]]:
    """Distinct (repo, commit) pairs — per-block combiner then a tiny
    driver-side union (pairs are bounded by repo count × commits)."""

    def fn(t: pa.Table) -> pa.Table:
        key = pa.table({"repo": t["repo"], "commit": t["commit"]})
        return key.group_by(["repo", "commit"]).aggregate([])

    rows = corpus_ds.map_batches(fn, batch_format="pyarrow").take_all()
    return {(r["repo"], r["commit"]) for r in rows}
