"""Eval-set decontamination: flag training documents that share any
k-token shingle with a held-out evaluation set.

The standard pre-training hygiene operator (n-gram overlap
decontamination à la GPT-3 appendix C / open reproductions): before a
corpus ships, every doc overlapping an eval benchmark must be flagged
or dropped, or downstream evals are contaminated.

Ray-Data-first shape — the eval side is SMALL by definition (an eval
suite is thousands of docs, the corpus is the 100 TB side):

  1. One streaming pass over the EVAL docs builds the distinct shingle
     fingerprint set (64-bit blake2b per shingle, vectorized by
     uniqueness) — per-block distinct partials, deduped on the driver,
     broadcast once via ``ray.put`` as a SORTED uint64 array.
  2. One streaming pass over the CORPUS: per-doc shingle fingerprints →
     ``np.searchsorted`` membership against the broadcast array →
     boolean ``contaminated`` column. No shuffle, no corpus
     materialization; the corpus side is a pure map.

Fingerprint collisions (two distinct shingles with equal blake2b-64)
could only over-flag; at eval-set scale (≤ ~10^8 shingles) the
collision probability is ~10^-3 per full set and any collision still
requires the colliding shingle to appear in a corpus doc. Tokenization
is the shared whitespace rule (lower + trim + split ``\\s+``) so the
DuckDB oracle can replicate the semantics with exact string shingles
(see __ray_entry__ ``decontam``). Docs with fewer than ``k`` tokens
fingerprint their whole token sequence as one shingle; empty docs are
never contaminated.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

_WS = re.compile(r"\s+")


def _tokens(text: str) -> list[str]:
    stripped = (text or "").strip().lower()
    return _WS.split(stripped) if stripped else []


def _doc_shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-token shingle fingerprints of one doc (uint64)."""
    toks = _tokens(text)
    if not toks:
        return np.empty(0, dtype=np.uint64)
    if len(toks) < k:
        grams = {" ".join(toks)}
    else:
        grams = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    out = np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(g.encode(), digest_size=8).digest(), "little"
            )
            for g in grams
        ),
        dtype=np.uint64,
        count=len(grams),
    )
    return out


def eval_fingerprints(eval_ds, k: int = 5, text_col: str = "text"):
    """Distinct shingle fingerprints of the eval set as a sorted uint64
    numpy array (driver-side, eval-sized)."""

    def partial(batch: pa.Table) -> pa.Table:
        hs = [_doc_shingle_hashes(t, k) for t in batch[text_col].to_pylist()]
        u = (
            np.unique(np.concatenate(hs))
            if hs
            else np.empty(0, dtype=np.uint64)
        )
        return pa.table({"h": pa.array(u.view(np.int64), pa.int64())})

    part = eval_ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if "h" not in part.columns or not len(part):
        return np.empty(0, dtype=np.uint64)
    return np.unique(part["h"].to_numpy().view(np.uint64))


def decontaminate(corpus_ds, eval_ds, k: int = 5, text_col: str = "text",
                  id_col: str = "doc_id", drop: bool = False):
    """Append a boolean ``contaminated`` column to ``corpus_ds`` (or
    drop flagged rows when ``drop=True``). The eval fingerprint set is
    broadcast once (``ray.put``); the corpus pass is a pure streaming
    map — safe at any corpus scale."""
    import ray

    fps = eval_fingerprints(eval_ds, k, text_col)
    ref = ray.put(fps)

    def flag(batch: pa.Table) -> pa.Table:
        table = ray.get(ref)  # zero-copy view of the broadcast array
        texts = batch[text_col].to_pylist()
        out = np.zeros(len(texts), dtype=bool)
        if len(table):
            for j, t in enumerate(texts):
                hs = _doc_shingle_hashes(t, k)
                if len(hs):
                    pos = np.searchsorted(table, hs)
                    pos[pos == len(table)] = 0
                    out[j] = bool(np.any(table[pos] == hs))
        batch = batch.append_column("contaminated", pa.array(out, pa.bool_()))
        if drop:
            batch = batch.filter(pa.array(~out, pa.bool_()))
        return batch

    return corpus_ds.map_batches(flag, batch_format="pyarrow")
