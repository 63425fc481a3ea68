"""Sequence packing: assign documents to fixed token-budget training
packs — the pre-training step that concatenates short documents into
full context windows so no compute is wasted on padding.

Packing rule (contiguous greedy by id): docs ordered by id; pack_id =
floor(tokens_before / budget) where tokens_before is the running token
count of all earlier docs. A pack may overshoot the budget by at most
one document (the standard contiguous approximation — exact first-fit
bin packing is order-dependent and neither parallelizes nor has an SQL
twin; this rule is a pure function of the sorted token counts).

Ray-Data-first shape — a DISTRIBUTED PREFIX SCAN, no shuffle:

  pass 1: per-block (block-min id, token sum) partials → the driver
          sorts by block-min id and computes exclusive prefix offsets
          (O(blocks) work, bytes per block).
  pass 2: per-block local cumsum + the broadcast block offset →
          pack_id per row. Pure map.

Assumes blocks partition the id space in sorted runs (true for a
sorted/range-partitioned dataset — e.g. a parquet read of id-ordered
files; asserted per block in pass 2 via block-min monotonicity is NOT
checked here — the caller owns the ordering contract, documented).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_WS = re.compile(r"\s+")
# tokenizer-aware cost: the BPE-ish subword rule shared with
# text.token_stats_batch (alpha runs, digit runs, single marks) — the
# budget then approximates a real tokenizer's sequence length instead
# of whitespace word count
_BPE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")


def _token_counts(texts, cost: str = "ws") -> np.ndarray:
    out = np.empty(len(texts), dtype=np.int64)
    if cost == "bpe":
        for i, t in enumerate(texts):
            out[i] = len(_BPE.findall(t or ""))
        return out
    for i, t in enumerate(texts):
        s = (t or "").strip()
        out[i] = len(_WS.split(s)) if s else 0
    return out


def pack_documents(ds, budget: int, text_col: str = "text",
                   id_col: str = "doc_id", cost: str = "ws"):
    """Append ``n_tokens`` and ``pack_id`` columns. ``budget`` is the
    pack's token capacity; ``cost`` picks the per-doc length rule
    ("ws" whitespace words, "bpe" subword regex). Two streaming
    passes; driver holds one row per block."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        toks = _token_counts(batch[text_col].to_pylist(), cost)
        if not ids:
            return pa.table({"bmin": pa.array([], pa.int64()),
                             "total": pa.array([], pa.int64())})
        return pa.table({
            "bmin": pa.array([min(ids)], pa.int64()),
            "total": pa.array([int(toks.sum())], pa.int64()),
        })

    part = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    if "bmin" not in part.columns or not len(part):
        offsets = {}
    else:
        part = part.sort_values("bmin", kind="stable")
        excl = np.concatenate(([0], np.cumsum(part["total"].to_numpy())[:-1]))
        offsets = dict(zip(part["bmin"].astype(np.int64), excl.astype(np.int64)))

    import ray

    ref = ray.put(offsets)

    def assign(batch: pa.Table) -> pa.Table:
        offs = ray.get(ref)
        ids = batch[id_col].to_pylist()
        toks = _token_counts(batch[text_col].to_pylist(), cost)
        if not ids:
            batch = batch.append_column("n_tokens", pa.array([], pa.int64()))
            return batch.append_column("pack_id", pa.array([], pa.int64()))
        # rows inside a block may be unsorted; pack ids follow id order
        order = np.argsort(np.asarray(ids, dtype=np.int64), kind="stable")
        sorted_toks = toks[order]
        before = np.concatenate(([0], np.cumsum(sorted_toks)[:-1]))
        before += offs[min(ids)]
        pack_sorted = before // budget
        pack = np.empty(len(ids), dtype=np.int64)
        pack[order] = pack_sorted
        batch = batch.append_column("n_tokens", pa.array(toks, pa.int64()))
        return batch.append_column("pack_id", pa.array(pack, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")
