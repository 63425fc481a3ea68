"""PMI collocation mining: top-k adjacent token bigrams by pointwise
mutual information — the classic corpus-statistics operator (Church &
Hanks 1990) used to find multiword expressions and to audit corpus
composition before training.

Ray-Data-first shape — ONE corpus pass, ONE shuffle:

  * Each block emits in-block-aggregated (w1, w2, c) partials for both
    bigrams AND unigrams in the same table (unigram rows use w2 = "",
    impossible for a real ``\\S+`` token), so a single
    ``groupby(w1, w2)`` produces every count the statistic needs.
    Shuffle volume = distinct grams per block, never tokens.
  * Totals (corpus token count, corpus bigram count) are streaming
    sums over the aggregated gram table — it is materialized once and
    is vocabulary-sized, orders of magnitude below the corpus.
  * Unigram counts join back to the (min_count-filtered) bigram rows
    via a count-guarded driver broadcast (sorted token array +
    ``np.searchsorted``); past ``driver_limit`` distinct tokens the
    join runs as two bucketed hash joins instead — no all-to-all on
    anything corpus-sized either way.
  * The final ORDER BY pmi DESC LIMIT k is ``agg.global_topk`` —
    per-block partial top-k, result-sized final sort.

PMI is computed exactly as the SQL oracle spells it —
``ln((c_xy / n_bi) / ((c_x / n_uni) * (c_y / n_uni)))`` in float64 with
the same operand order — so rounded values are bit-identical.
Tokenization is the shared whitespace rule (lower + trim + split on
``\\s+``), mirrored by ``regexp_extract_all(lower(trim(text)), '\\S+')``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS = re.compile(r"\s+")


def _flat_tokens(texts: list[str]):
    """Flat object array of lowered tokens + per-doc lengths."""
    toks = []
    lens = np.empty(len(texts), np.int64)
    for i, s in enumerate(texts):
        t = _WS.split((s or "").strip().lower())
        t = t if t != [""] else []
        toks.extend(t)
        lens[i] = len(t)
    return np.asarray(toks, dtype=object), lens


def _gram_partials(t: pa.Table, text_col: str) -> pa.Table:
    """In-block (w1, w2, c) counts: bigram rows + unigram rows
    (w2 = ''), Arrow group_by, no Python loop over token pairs."""
    flat, lens = _flat_tokens(t[text_col].to_pylist())
    n = len(flat)
    if n == 0:
        return pa.table({"w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string()),
                         "c": pa.array([], pa.int64())})
    # adjacent pairs, masking the doc boundaries
    ends = np.cumsum(lens)            # one-past-last index per doc
    boundary = np.zeros(max(n - 1, 0), bool)
    inner = ends[ends < n] - 1        # last token index of each doc
    inner = inner[(inner >= 0) & (inner < n - 1)]  # empty docs -> -1
    boundary[inner] = True
    w1 = flat[:-1][~boundary]
    w2 = flat[1:][~boundary]
    grams = pa.table({
        "w1": pa.array(np.concatenate([w1, flat]), pa.string()),
        "w2": pa.array(
            np.concatenate([w2, np.full(n, "", dtype=object)]),
            pa.string()),
    })
    agg = grams.group_by(["w1", "w2"]).aggregate([("w2", "count")])
    return agg.rename_columns(["w1", "w2", "c"])


def pmi_bigrams(ds, text_col: str = "text", *, k: int = 20,
                min_count: int = 5, driver_limit: int = 5_000_000,
                ndigits: int = 6):
    """Top-k bigrams by PMI (count >= min_count). Returns
    (w1, w2, c_xy, pmi) ordered by pmi desc, w1, w2."""
    import ray
    from ray.data.aggregate import Sum

    from .agg import global_topk

    grams = (
        ds.map_batches(lambda t: _gram_partials(t, text_col),
                       batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("c", alias_name="c"))
        .materialize()
    )
    uni = grams.filter(expr="w2 == ''")
    n_uni = uni.sum("c") or 0
    bi_all = grams.filter(expr="w2 != ''")
    n_bi = bi_all.sum("c") or 0
    bi = bi_all.filter(expr=f"c >= {int(min_count)}")
    if n_bi == 0 or n_uni == 0:
        return ds.map_batches(
            lambda t: pa.table({"w1": pa.array([], pa.string()),
                                "w2": pa.array([], pa.string()),
                                "c_xy": pa.array([], pa.int64()),
                                "pmi": pa.array([], pa.float64())}),
            batch_format="pyarrow").limit(0)

    n_vocab = uni.count()
    if n_vocab <= driver_limit:
        from .dedup import collect_arrow

        ut = collect_arrow(uni)
        words = np.asarray(ut["w1"].to_pylist(), dtype=object)
        counts = ut["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(words)
        bc = ray.put((words[order], counts[order]))

        def score(t: pa.Table) -> pa.Table:
            w_sorted, c_sorted = ray.get(bc)
            w1 = np.asarray(t["w1"].to_pylist(), dtype=object)
            w2 = np.asarray(t["w2"].to_pylist(), dtype=object)
            cx = c_sorted[np.searchsorted(w_sorted, w1)]
            cy = c_sorted[np.searchsorted(w_sorted, w2)]
            c_xy = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
            # same operand order as the SQL oracle
            pmi = np.log((c_xy / n_bi) / ((cx / n_uni) * (cy / n_uni)))
            return pa.table({
                "w1": t["w1"], "w2": t["w2"],
                "c_xy": t["c"],
                "pmi": pa.array(np.round(pmi, ndigits), pa.float64()),
            })

        scored = bi.map_batches(score, batch_format="pyarrow")
    else:
        from .joins import bucketed_join

        cx_t = uni.map_batches(
            lambda t: t.rename_columns(["w1", "_w2", "cx"])
            .drop_columns(["_w2"]), batch_format="pyarrow")
        cy_t = uni.map_batches(
            lambda t: t.rename_columns(["w2", "_w2", "cy"])
            .drop_columns(["_w2"]), batch_format="pyarrow")
        j = bucketed_join(bi, cx_t, on=["w1"])
        j = bucketed_join(j, cy_t, on=["w2"])

        def score_joined(t: pa.Table) -> pa.Table:
            cx = t["cx"].to_numpy(zero_copy_only=False).astype(np.float64)
            cy = t["cy"].to_numpy(zero_copy_only=False).astype(np.float64)
            c_xy = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
            pmi = np.log((c_xy / n_bi) / ((cx / n_uni) * (cy / n_uni)))
            return pa.table({
                "w1": t["w1"], "w2": t["w2"],
                "c_xy": t["c"],
                "pmi": pa.array(np.round(pmi, ndigits), pa.float64()),
            })

        scored = j.map_batches(score_joined, batch_format="pyarrow")

    return global_topk(scored, ["pmi", "w1", "w2"], k,
                       descending=[True, False, False])
