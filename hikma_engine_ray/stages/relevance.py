"""BM25 text-relevance ranking over a document corpus.

The standard lexical retrieval operator a training-data pipeline needs
for query-based corpus curation (salient-document mining, dedup of
near-query boilerplate, eval-set construction). Okapi BM25 with the
``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf (always positive) and the
usual k1/b defaults.

Ray-Data-first shape, two streaming passes over the docs + one
result-sized merge:

  pass 1 (stats):   map_batches → per-block partials (doc count, token
                    count, per-query-term document frequency) — rows =
                    O(blocks × |query|), reduced on the driver.
  pass 2 (score):   map_batches with the broadcast idf/avgdl constants
                    → per-block top-k partials (score desc, doc_id asc).
  merge:            one small table → global top-k.

Nothing materializes the corpus; the only driver-side data is
O(blocks × |query| + k). Tokenization is the shared whitespace rule
(lower + trim + split on ``\\s+``) so the DuckDB oracle can replicate
scores exactly (see __ray_entry__ ``bm25_topk``).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_WS = re.compile(r"\s+")


def _tokens(text: str) -> list[str]:
    stripped = (text or "").strip().lower()
    return _WS.split(stripped) if stripped else []


def bm25_topk(ds, query: str, k: int = 10, k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id",
              ndigits: int | None = 4):
    """Top-``k`` docs by BM25 score for ``query``. Returns a pandas
    DataFrame (result-sized) with columns (doc_id, score), ordered by
    (score desc, doc_id asc). ``ndigits`` rounds the score for stable
    cross-engine comparison (None = raw float)."""
    q_terms = sorted(set(_tokens(query)))
    if not q_terms:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    nq = len(q_terms)

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        df = np.zeros(nq, dtype=np.int64)
        toks_total = 0
        for t in texts:
            toks = _tokens(t)
            toks_total += len(toks)
            s = set(toks)
            for i, term in enumerate(q_terms):
                df[i] += term in s
        return pa.table(
            {
                "term_idx": pa.array(np.arange(nq, dtype=np.int64), pa.int64()),
                "df": pa.array(df, pa.int64()),
                "n_docs": pa.array(np.full(nq, len(texts)), pa.int64()),
                "n_tokens": pa.array(np.full(nq, toks_total), pa.int64()),
            }
        )

    part = ds.map_batches(stats, batch_format="pyarrow", batch_size=None).to_pandas()
    if "term_idx" not in part.columns:  # empty corpus → column-less frame
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    agg = part.groupby("term_idx")["df"].sum()
    df_vec = agg.reindex(range(nq), fill_value=0).to_numpy(dtype=np.float64)
    # n_docs/n_tokens repeat once per term row per block — divide by nq
    n_total = int(part["n_docs"].sum()) // nq
    if n_total == 0:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    avgdl = (part["n_tokens"].sum() / nq) / n_total
    idf = np.log(1.0 + (n_total - df_vec + 0.5) / (df_vec + 0.5))

    qpos = {t: i for i, t in enumerate(q_terms)}

    def score(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        tf = np.zeros((len(texts), nq), dtype=np.float64)
        dl = np.empty(len(texts), dtype=np.float64)
        for j, t in enumerate(texts):
            toks = _tokens(t)
            dl[j] = len(toks)
            for tok in toks:
                i = qpos.get(tok)
                if i is not None:
                    tf[j, i] += 1.0
        denom = tf + k1 * (1.0 - b + b * dl[:, None] / avgdl)
        with np.errstate(invalid="ignore"):
            s = np.where(tf > 0.0, tf * (k1 + 1.0) / denom, 0.0) @ idf
        if ndigits is not None:
            # round BEFORE ranking so the (score desc, id asc) order is
            # identical to an oracle that orders by the rounded score;
            # half-away-from-zero to match SQL round() (numpy's .round
            # is half-to-even)
            from ..functions.num import round_half_away

            s = round_half_away(s, ndigits)
        # per-block partial top-k: only score>0 rows can place
        hit = s > 0.0
        ids, s = ids[hit], s[hit]
        if len(ids) > k:
            # stable order: score desc then id asc
            order = np.lexsort((ids, -s))[:k]
            ids, s = ids[order], s[order]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "score": pa.array(s, pa.float64())})

    top = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return (
        top.sort_values(["score", id_col], ascending=[False, True],
                        kind="stable")
        .head(k)
        .reset_index(drop=True)
    )


def hybrid_search(docs_ds, emb_ds, query_text: str, query_vec,
                  k: int = 10, pool: int = 50, rrf_k: int = 60,
                  id_col: str = "doc_id", emb_id_col: str = "vec_id",
                  ndigits: int = 6):
    """Hybrid lexical+semantic retrieval: reciprocal-rank fusion of the
    BM25 top-``pool`` and the embedding-cosine top-``pool``.

    rrf(d) = 1/(rrf_k + rank_bm25(d)) + 1/(rrf_k + rank_cos(d)), with a
    missing ranking contributing 0 (the standard RRF formulation).
    Fusion runs on RANKS (ints), so cross-engine float noise can't leak
    into the fused ordering as long as each leg's own ordering is
    deterministic — both legs rank by (rounded score desc, id asc),
    which their oracles replicate. Cost: the two leg operators (both
    streaming with per-block partial top-k) + a pool-sized driver merge.
    """
    from .similarity import brute_force_topk

    lex = bm25_topk(docs_ds, query_text, k=pool, ndigits=4,
                    id_col=id_col)
    lex = lex.rename(columns={id_col: "id"})
    lex["rank_b"] = np.arange(1, len(lex) + 1, dtype=np.int64)

    sem = brute_force_topk(emb_ds, query_vec, k=pool,
                           id_col=emb_id_col).to_pandas()
    sem = sem.rename(columns={emb_id_col: "id"})
    sem["rank_c"] = np.arange(1, len(sem) + 1, dtype=np.int64)

    fused = lex[["id", "rank_b"]].merge(sem[["id", "rank_c"]],
                                        on="id", how="outer")
    rb = fused["rank_b"].to_numpy(dtype=np.float64, na_value=np.inf)
    rc = fused["rank_c"].to_numpy(dtype=np.float64, na_value=np.inf)
    rrf = 1.0 / (rrf_k + rb) + 1.0 / (rrf_k + rc)
    from ..functions.num import round_half_away

    fused["rrf"] = round_half_away(rrf, ndigits)
    out = (
        fused[["id", "rrf"]]
        .sort_values(["rrf", "id"], ascending=[False, True], kind="stable")
        .head(k)
        .reset_index(drop=True)
        .rename(columns={"id": id_col})
    )
    out[id_col] = out[id_col].astype("int64")
    return out


def tfidf_topk(ds, per_doc_k: int = 3, text_col: str = "text",
               id_col: str = "doc_id", ndigits: int = 6,
               nbuckets: int = 16):
    """Per-document top-``per_doc_k`` terms by tf-idf (score =
    tf · ln(N/df)), the classic salient-term extractor.

    Fully distributed, no vocabulary broadcast, TWO shuffles total:
    the term-count pass emits exact per-doc (doc, token, tf) rows (a
    doc lives in exactly one batch, so np.unique per doc IS the final
    tf — no merge shuffle needed); ONE token-bucketed hash shuffle
    computes df (rows per token = distinct docs, since rows are unique
    per (doc, token)) and scores in place; grouped_topk's combiner
    keeps ≤ per_doc_k rows per doc per block before the second, tiny
    shuffle. Volume: distinct (doc, token) pairs once, then k·docs.

    Ranking uses the ROUNDED score (desc) with the token as tiebreak so
    a SQL oracle reproduces the exact row set: analytically-equal
    scores round identically on both engines, while raw last-ulp
    differences could flip an ordering."""
    from ..functions.num import round_half_away
    from .agg import grouped_topk
    from .dedup import BUCKET_COL, add_bucket_column, blocks_for_keys

    n_docs = ds.count()

    def term_counts(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        out_id, out_tok, out_tf = [], [], []
        for i, text in zip(ids, batch[text_col].to_pylist()):
            toks = _tokens(text)
            if not toks:
                continue
            vals, counts = np.unique(np.asarray(toks, dtype=object),
                                     return_counts=True)
            out_id.extend([i] * len(vals))
            out_tok.extend(vals.tolist())
            out_tf.extend(counts.tolist())
        return pa.table({
            id_col: pa.array(out_id),
            "token": pa.array(out_tok, pa.string()),
            "tf": pa.array(out_tf, pa.int64()),
        })

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # df = rows per token (each row is one distinct doc for the
        # token); every occurrence of a token lands in this bucket
        df = g.groupby("token", sort=False)["token"].transform("size")
        s = round_half_away(
            g["tf"].to_numpy(dtype=np.float64)
            * np.log(n_docs / df.to_numpy(dtype=np.float64)),
            ndigits,
        )
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "token": g["token"].to_numpy(),
            "score": s,
        })

    scored = (
        ds.map_batches(term_counts, batch_format="pyarrow")
        .map_batches(add_bucket_column(["token"], nbuckets),
                     batch_format="pyarrow")
        .repartition(blocks_for_keys(nbuckets))
        .groupby(BUCKET_COL)
        .map_groups(
            lambda g: score_bucket(g.drop(columns=[BUCKET_COL])),
            batch_format="pandas",
        )
    )
    return grouped_topk(scored, [id_col], "score", per_doc_k,
                        descending=True, tiebreak=["token"],
                        nbuckets=nbuckets)
