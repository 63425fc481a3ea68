"""Unigram language-model scoring — the classic corpus quality signal
(per-doc mean token log-probability under a unigram LM trained on the
corpus itself; low-probability docs are gibberish / OCR noise / wrong
language; the standard cheap stand-in for KenLM perplexity filtering in
training-data pipelines, cf. CCNet, Wenzek et al. 2020).

Model: add-one-smoothed unigram over the corpus vocabulary,
p(tok) = (count(tok) + 1) / (N + V) with N total token occurrences and
V distinct tokens. Doc score = mean over the doc's tokens (with
repeats) of ln p(tok); empty docs score 0.0. Token rule is the
vocabulary rule shared with token_vocab's oracle: lower(text) split on
runs of [^a-z0-9_].

Ray-Data-first shape:

  train   one combiner-first pass (per-block value_counts partials ->
          groupby(token).sum) — the token_vocab shuffle, one row per
          distinct token per block.
  score   count-guarded: a vocab within `driver_limit` is broadcast
          ONCE via ray.put as (sorted uint64 token-hash array, counts)
          — numpy arrays are zero-copy plasma views per worker — and
          scoring is a vectorized searchsorted + segment-mean second
          streaming pass. Past the limit, the exact fallback explodes
          (doc, token) rows through a bucketed hash join against the
          vocab and aggregates per doc — one extra shuffle, never
          holding the vocab anywhere whole. Both paths
          equivalence-tested.

100 TB note: a lowercase word vocab grows ~O(corpus^0.5..0.7) (Heaps'
law) — ~1e8 distinct tokens at 100 TB ≈ 1.6 GB as hash+count arrays,
still broadcastable per node via the object store; the join fallback
exists for tokenizers whose vocab doesn't flatten (e.g. byte n-grams).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_TOKEN = re.compile(r"[a-z0-9_]+")
_SEED = 11


def _doc_tokens(texts: list) -> tuple[list, np.ndarray]:
    toks = [_TOKEN.findall((t or "").lower()) for t in texts]
    lens = np.fromiter((len(x) for x in toks), dtype=np.int64, count=len(toks))
    return toks, lens


def unigram_counts(ds, text_col: str = "text"):
    """Corpus unigram table: Dataset of (token, n). Combiner-first."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        toks, _ = _doc_tokens(batch[text_col].to_pylist())
        flat = [t for doc in toks for t in doc]
        if not flat:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = pd.Series(flat, dtype="object").value_counts()
        return pa.table({"token": pa.array(vc.index.to_list(), pa.string()),
                         "n": pa.array(vc.to_numpy(), pa.int64())})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )


def _hash_tokens(flat: list) -> np.ndarray:
    import polars as pl

    if not flat:
        return np.empty(0, np.uint64)
    return pl.Series(flat, dtype=pl.String).hash(seed=_SEED).to_numpy().astype(np.uint64)


def lm_score(ds, text_col: str = "text", id_col: str = "doc_id",
             driver_limit: int = 50_000_000, nbuckets: int = 32):
    """Per-doc unigram LM score: (id, n_tok, lm_logprob). Trains on
    ``ds`` itself; see module docstring for the two scoring paths."""
    import ray
    from ray.data.aggregate import Count, Sum

    from ..functions.num import round_half_away

    vocab = unigram_counts(ds, text_col).materialize()
    tot = vocab.aggregate(Sum("n", alias_name="N"), Count(alias_name="V"))
    n_total = float(tot["N"] or 0.0)
    v_size = float(tot["V"] or 0.0)
    denom = n_total + v_size

    if v_size <= driver_limit:
        pdf = vocab.to_pandas()
        h = _hash_tokens(pdf["token"].to_list())
        order = np.argsort(h, kind="stable")
        href = ray.put(h[order])
        cref = ray.put(pdf["n"].to_numpy().astype(np.int64)[order])

        def score(batch: pa.Table) -> pa.Table:
            hs, cs = ray.get(href), ray.get(cref)
            toks, lens = _doc_tokens(batch[text_col].to_pylist())
            flat = [t for doc in toks for t in doc]
            th = _hash_tokens(flat)
            if th.size:
                idx = np.searchsorted(hs, th)
                idx[idx == hs.size] = 0
                # every scored token was counted in training (same corpus)
                cnt = np.where(hs[idx] == th, cs[idx], 0).astype(np.float64)
                logp = np.log((cnt + 1.0) / denom)
            else:
                logp = np.empty(0, np.float64)
            # segment sum via bincount (reduceat mishandles zero-token
            # docs: an empty segment's start index doubles as the
            # previous segment's end)
            di = np.repeat(np.arange(len(lens)), lens)
            sums = np.bincount(di, weights=logp, minlength=len(lens)) \
                if th.size else np.zeros(len(lens))
            mean = sums / np.maximum(lens, 1)
            return pa.table({
                id_col: batch[id_col],
                "n_tok": pa.array(lens, pa.int64()),
                "lm_logprob": pa.array(round_half_away(mean, 6), pa.float64()),
            })

        return ds.map_batches(score, batch_format="pyarrow")

    # exact join fallback: explode (id, token) rows, hash-join vs vocab,
    # per-doc mean, left-join back so zero-token docs keep score 0.0
    from .joins import bucketed_join

    def explode(batch: pa.Table) -> pa.Table:
        toks, lens = _doc_tokens(batch[text_col].to_pylist())
        ids = np.repeat(
            np.asarray(batch[id_col].to_pylist(), dtype=np.int64), lens
        )
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "token": pa.array([t for doc in toks for t in doc], pa.string()),
        })

    from ray.data.aggregate import Mean

    occ = ds.map_batches(explode, batch_format="pyarrow")
    joined = bucketed_join(occ, vocab, on=["token"], nbuckets=nbuckets,
                           how="inner")

    def logp_col(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch["n"].to_pylist(), dtype=np.float64)
        return pa.table({
            id_col: batch[id_col],
            "logp": pa.array(np.log((c + 1.0) / denom), pa.float64()),
        })

    per_doc = (
        joined.map_batches(logp_col, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Mean("logp", alias_name="mean_logp"),
                   Count(alias_name="n_tok"))
    )

    def base(batch: pa.Table) -> pa.Table:
        return batch.select([id_col])

    out = bucketed_join(
        ds.map_batches(base, batch_format="pyarrow"), per_doc,
        on=[id_col], nbuckets=nbuckets, how="left",
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mean = np.asarray(
            pc.fill_null(batch["mean_logp"], 0.0).to_pylist(), dtype=np.float64
        )
        nt = pc.cast(pc.fill_null(batch["n_tok"], 0), pa.int64())
        return pa.table({
            id_col: batch[id_col],
            "n_tok": nt,
            "lm_logprob": pa.array(round_half_away(mean, 6), pa.float64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")
