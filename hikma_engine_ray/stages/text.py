"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's operators (its summary heuristic M9 is the only
text analysis it does), these are the standard corpus-curation stages a
100 TB text pipeline needs: token counting, quality scoring, language
ID, and document fingerprinting. All are stateless or actor-pool
``map_batches`` stages over Arrow batches; the scoring rules are
defined precisely enough to be mirrored in the DuckDB oracle SQL
(token_count, char/punct ratios) or checked rows-only (langid,
fingerprint).
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# token rule (shared with oracle SQL): trim, split on runs of whitespace
_WS = re.compile(r"\s+")
# BPE-ish subword rule: alpha runs, digit runs, single non-alnum marks
_BPE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")

# tiny deterministic stopword profiles for n-gram/stopword language ID
_LANG_STOPWORDS = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "on", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "auf", "ein", "zu"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans"},
    "es": {"el", "la", "los", "y", "de", "un", "una", "es", "para", "en"},
}


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """token_count (whitespace rule) + bpe_count (subword regex) per doc."""
    texts = batch["text"].to_pylist()
    tc = np.empty(len(texts), dtype=np.int64)
    bc = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        t = t or ""
        stripped = t.strip()
        tc[i] = len(_WS.split(stripped)) if stripped else 0
        bc[i] = len(_BPE.findall(t))
    batch = batch.append_column("token_count", pa.array(tc, pa.int64()))
    return batch.append_column("bpe_count", pa.array(bc, pa.int64()))


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality signals: n_chars, alpha_ratio, punct_ratio, space_ratio,
    mean_token_len — all expressible in SQL for the oracle. Ratios are
    over n_chars (0.0 for empty docs). ``text_col`` selects the column
    (round-4 ADVICE: curate_corpus passes non-default text columns)."""
    text = batch[text_col]
    n = pc.cast(pc.utf8_length(text), pa.float64())
    n_alpha = pc.cast(pc.utf8_length(pc.replace_substring_regex(text, "[A-Za-z]", "")), pa.float64())
    n_punct = pc.cast(pc.utf8_length(pc.replace_substring_regex(text, r"[.,;:!?'\"()]", "")), pa.float64())
    n_space = pc.cast(pc.utf8_length(pc.replace_substring_regex(text, r"\s", "")), pa.float64())
    safe_n = pc.if_else(pc.equal(n, 0.0), pa.scalar(1.0), n)
    from ..functions.num import round_half_away

    batch = batch.append_column("n_chars_calc", pc.cast(n, pa.int64()))
    batch = batch.append_column(
        "alpha_ratio", round_half_away(pc.divide(pc.subtract(n, n_alpha), safe_n), 6)
    )
    batch = batch.append_column(
        "punct_ratio", round_half_away(pc.divide(pc.subtract(n, n_punct), safe_n), 6)
    )
    batch = batch.append_column(
        "space_ratio", round_half_away(pc.divide(pc.subtract(n, n_space), safe_n), 6)
    )
    return batch


class LangId:
    """Actor-pool stage: stopword-profile language ID (n-gram heuristic).

    State (compiled regex + profiles) built once per actor; per batch a
    vectorized-ish scoring loop. Emits ``lang_pred`` and ``lang_conf``."""

    def __init__(self):
        self.word = re.compile(r"[a-zA-Zäöüéèêáíóúñ]+")
        self.profiles = {k: frozenset(v) for k, v in _LANG_STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        preds = []
        confs = np.zeros(len(texts), dtype=np.float64)
        for i, t in enumerate(texts):
            words = self.word.findall((t or "").lower())
            if not words:
                preds.append("unknown")
                continue
            ws = set(words)
            scores = {k: len(ws & prof) for k, prof in self.profiles.items()}
            best = max(sorted(scores), key=lambda k: scores[k])
            if scores[best] == 0:
                preds.append("unknown")
            else:
                preds.append(best)
                confs[i] = scores[best] / len(self.profiles[best])
        batch = batch.append_column("lang_pred", pa.array(preds, pa.string()))
        return batch.append_column("lang_conf", pa.array(confs, pa.float64()))


def fingerprint_batch(batch: pa.Table, window: int = 16) -> pa.Table:
    """Document fingerprint: winnowed rolling hash (robust to small
    shifts). Deterministic: min crc32 over each ``window``-gram of the
    whitespace-normalized text, per 8-gram stride; final fingerprint =
    crc32 of the concatenated minima (hex)."""
    texts = batch["text"].to_pylist()
    fps = []
    for t in texts:
        norm = " ".join((t or "").split())
        data = norm.encode("utf-8", "surrogatepass")
        if len(data) <= window:
            fps.append(format(zlib.crc32(data), "08x"))
            continue
        minima = []
        for start in range(0, len(data) - window, 64):
            block = data[start : start + 64 + window]
            best = min(
                zlib.crc32(block[i : i + window])
                for i in range(0, max(1, len(block) - window))
            )
            minima.append(best)
        acc = zlib.crc32(b"".join(m.to_bytes(4, "big") for m in minima))
        fps.append(format(acc, "08x"))
    return batch.append_column("fingerprint", pa.array(fps, pa.string()))


def hash_sample(ds, id_col: str = "doc_id", rate: float = 0.25,
                keep_cols: list[str] | None = None):
    """Deterministic hash sampling: keep a row iff the first byte of
    md5(str(id)) falls under ``rate`` — the standard repeatable-split
    operator for training corpora (same rows on every run/engine, no
    RNG state, no coordination; SQL-replicable so it carries a DuckDB
    oracle). Pure filter: streams, never shuffles.

    ``rate >= 1.0`` short-circuits to a pass-through (the old 2-char-hex
    string compare against the 3-char '100' silently kept ~1/16 of rows
    — round-2 ADVICE); the compare is numeric so the threshold never
    depends on string-length quirks."""
    if rate >= 1.0:
        def passthrough(batch: pa.Table) -> pa.Table:
            return batch.select(keep_cols) if keep_cols else batch

        return ds.map_batches(passthrough, batch_format="pyarrow")
    threshold = max(0, int(rate * 256))

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        keep = pa.array(
            [int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16) < threshold
             for i in ids],
            pa.bool_(),
        )
        out = batch.filter(keep)
        return out.select(keep_cols) if keep_cols else out

    return ds.map_batches(fn, batch_format="pyarrow")


_VOCAB_TOKEN = re.compile(r"[a-z0-9_]+")


def token_vocab(ds, text_col: str = "text", top_n: int = 100):
    """Corpus vocabulary: top-N tokens by total occurrence count.
    Combiner-first: each batch pre-aggregates its own (token, n)
    partial counts vectorized (pandas value_counts), so the global
    groupby shuffles one row per DISTINCT token per block — never one
    row per occurrence."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch[text_col].to_pylist():
            toks.extend(_VOCAB_TOKEN.findall((t or "").lower()))
        if not toks:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = pd.Series(toks, dtype="object").value_counts()
        return pa.table({"token": pa.array(vc.index.to_list(), pa.string()),
                         "n": pa.array(vc.to_numpy(), pa.int64())})

    totals = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )
    from hikma_engine_ray.stages.agg import global_topk

    return global_topk(totals, ["n", "token"], top_n, descending=[True, False])


# PII / secret detection rules (RE2 syntax — pyarrow.compute and DuckDB
# both run RE2, so the oracle replicates these verbatim)
PII_PATTERNS = {
    # local-part@domain.tld
    "n_emails": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    # dotted-quad (syntactic; no octet range check — same rule both sides)
    "n_ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    # long opaque token: 32+ alphanumerics, the standard API-key heuristic
    "n_keyish": r"\b[A-Za-z0-9]{32,}\b",
}


def pii_scan_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc PII/secret hit counts + a has_pii flag — the filter stage
    a training corpus runs before anything else ships. Fully vectorized:
    one RE2 pass per pattern (pc.count_substring_regex), no Python over
    rows. Stateless → plain tasks."""
    text = batch[text_col]
    total = None
    for name, pat in PII_PATTERNS.items():
        cnt = pc.cast(pc.count_substring_regex(text, pat), pa.int64())
        batch = batch.append_column(name, cnt)
        total = cnt if total is None else pc.add(total, cnt)
    return batch.append_column("has_pii", pc.greater(total, 0))


def stratified_sample(ds, strata_col: str, rates: dict[str, float],
                      default_rate: float, id_col: str = "doc_id",
                      keep_cols: list[str] | None = None):
    """Deterministic per-stratum hash sampling: row kept iff the first
    byte of md5(str(id)) falls under its stratum's rate — the standard
    repeatable class-balancing operator (downsample the dominant
    language/source, keep the rare ones). Same hash rule as
    ``hash_sample``, so it is SQL-replicable and coordination-free;
    pure filter: streams, never shuffles."""
    thresholds = {s: max(0, min(256, int(r * 256))) for s, r in rates.items()}
    default_thr = max(0, min(256, int(default_rate * 256)))

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        strata = batch[strata_col].to_pylist()
        keep = pa.array(
            [
                int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16)
                < thresholds.get(s, default_thr)
                for i, s in zip(ids, strata)
            ],
            pa.bool_(),
        )
        out = batch.filter(keep)
        return out.select(keep_cols) if keep_cols else out

    return ds.map_batches(fn, batch_format="pyarrow")


def weighted_sample(ds, weight_col: str, id_col: str = "doc_id",
                    k: int = 15):
    """Deterministic weighted sampling without replacement — the
    Efraimidis–Spirakis (2006) exponential-key scheme: each row gets
    key = ln(u) / w with u a deterministic pseudo-random in (0, 1]
    derived from md5(str(id)); the k LARGEST keys are a weighted sample
    without replacement (equivalent to ranking u^(1/w)).

    Weight domain: POSITIVE reals (any magnitude — fractional weights
    are honored). Non-positive weights clamp to 1e-12, i.e. the row is
    effectively never sampled (weight 0 ⇒ probability 0); round-3
    ADVICE fixed an earlier max(w, 1) clamp that silently distorted
    weights in (0, 1).

    Distributed shape: stateless key map + per-block partial top-k →
    a (k × blocks)-row global sort. No shuffle of the corpus; same
    rows on every run/engine (the md5 idiom hash_sample uses), so it
    carries a DuckDB oracle ('0x'||substr(md5(id),1,8) casts to the
    identical 32-bit integer)."""
    from ..functions.num import round_half_away

    def part(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        w = batch[weight_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64, copy=False)
        h = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
             for i in ids),
            dtype=np.float64, count=len(ids),
        )
        u = (h + 1.0) / 4294967296.0
        key = np.log(u) / np.where(w > 0.0, w, 1e-12)
        keep = (np.argpartition(-key, min(k, key.size) - 1)[:k]
                if key.size > k else np.arange(key.size))
        out = batch.take(pa.array(np.sort(keep)))
        return out.append_column(
            "skey", pa.array(key[np.sort(keep)], pa.float64())
        )

    top = ds.map_batches(part, batch_format="pyarrow") \
        .sort(["skey", id_col], descending=[True, False]).limit(k)

    def rounded(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("skey"), "skey",
            round_half_away(t["skey"], 6),
        )

    return top.map_batches(rounded, batch_format="pyarrow")


def normalize_text_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Canonical text normalization before fingerprinting/dedup: NFC
    unicode normalization, lowercase, collapse whitespace runs to one
    space, trim. Emitted as ``text_norm`` so raw text survives for
    provenance. Rules chosen to be SQL-replicable verbatim
    (nfc_normalize → lower → regexp_replace '\\s+' → trim)."""
    import unicodedata

    texts = batch[text_col].to_pylist()
    out = [
        _WS.sub(" ", unicodedata.normalize("NFC", (t or "")).lower()).strip()
        for t in texts
    ]
    return batch.append_column("text_norm", pa.array(out, pa.string()))


def chunk_documents(ds, chunk_tokens: int = 64, overlap: int = 8,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Split documents into fixed-size token-window chunks with overlap
    — the context-window chunker every embedding/RAG ingestion pipeline
    runs before vectorizing. Whitespace token rule (the shared
    tokenizer); stride = chunk_tokens − overlap; a final short window
    is emitted only if it starts before the doc ends (i.e. standard
    sliding windows anchored at multiples of the stride, last window
    truncated). Empty docs produce no chunks.

    Stateless flat map — each batch expands independently; expansion
    factor is n_tokens/stride ≈ 1/(1 − overlap/chunk), so block size
    grows by a small constant and the stage streams at any corpus
    size. Output: id, chunk_id (0-based), n_tokens, chunk_text."""
    assert 0 <= overlap < chunk_tokens
    stride = chunk_tokens - overlap

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        out_id, out_cid, out_n, out_txt = [], [], [], []
        for i, t in zip(ids, batch[text_col].to_pylist()):
            stripped = (t or "").strip()
            if not stripped:
                continue
            toks = _WS.split(stripped)
            for c, start in enumerate(range(0, len(toks), stride)):
                win = toks[start:start + chunk_tokens]
                out_id.append(i)
                out_cid.append(c)
                out_n.append(len(win))
                out_txt.append(" ".join(win))
                if start + chunk_tokens >= len(toks):
                    break
        return pa.table({
            id_col: pa.array(out_id),
            "chunk_id": pa.array(out_cid, pa.int64()),
            "n_tokens": pa.array(out_n, pa.int64()),
            "chunk_text": pa.array(out_txt, pa.string()),
        })

    return ds.map_batches(expand, batch_format="pyarrow")


def repetition_stats(ds, text_col: str = "text", id_col: str = "doc_id",
                     ndigits: int = 6):
    """Gopher-style intra-document repetition signals (Rae et al. 2021
    Table A1 analog, at the token granularity these single-line docs
    have): fraction of tokens that repeat an earlier token
    (1 − distinct/total) and the fraction of tokens covered by the
    most frequent 2-gram (2·modal-count/total, capped at 1). Stateless
    per-row map, no shuffle — the standard quality pre-filter a 100 TB
    curation pass applies before dedup.

    Output: id, n_tokens, dup_token_frac, top_bigram_frac."""

    def stats(batch: pa.Table) -> pa.Table:
        return repetition_stats_batch(batch, text_col, id_col, ndigits)

    return ds.map_batches(stats, batch_format="pyarrow")


def repetition_stats_batch(batch: pa.Table, text_col: str = "text",
                           id_col: str = "doc_id",
                           ndigits: int = 6) -> pa.Table:
    """The per-batch kernel behind repetition_stats (exposed so
    composed pipelines — corpus_funnel — reuse the exact tested
    semantics)."""
    from ..functions.num import round_half_away

    ids = batch[id_col].to_pylist()
    n_tok = np.empty(len(ids), dtype=np.int64)
    dup_frac = np.zeros(len(ids), dtype=np.float64)
    big_frac = np.zeros(len(ids), dtype=np.float64)
    for i, t in enumerate(batch[text_col].to_pylist()):
        stripped = (t or "").strip().lower()
        toks = _WS.split(stripped) if stripped else []
        n_tok[i] = len(toks)
        if toks:
            dup_frac[i] = 1.0 - len(set(toks)) / len(toks)
        if len(toks) >= 2:
            grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            _, counts = np.unique(np.asarray(grams, dtype=object),
                                  return_counts=True)
            big_frac[i] = min(2.0 * counts.max() / len(toks), 1.0)
    return pa.table({
        id_col: batch[id_col],
        "n_tokens": pa.array(n_tok, pa.int64()),
        "dup_token_frac": pa.array(
            round_half_away(dup_frac, ndigits), pa.float64()),
        "top_bigram_frac": pa.array(
            round_half_away(big_frac, ndigits), pa.float64()),
    })


def mix_weights(ds, group_col: str, target: dict[str, float],
                ndigits: int = 6):
    """Domain-mixture reweighting: per-group sampling rates that
    reshape the corpus's group distribution into ``target`` (rates
    normalized so the largest is 1.0 — pure down-sampling, the standard
    data-mixing computation before a training run). One combiner-first
    count aggregate (group-count-sized result); the rate table is what
    a downstream stratified_sample consumes.

    Output: group, n, observed_frac, target_frac, sample_rate."""
    from .agg import grouped_agg
    from ..functions.num import round_half_away

    counts = grouped_agg(
        ds, keys=[group_col], spec={"n": (group_col, "count")}
    ).to_pandas()  # group-count-sized
    counts = counts.sort_values(group_col).reset_index(drop=True)
    total = float(counts["n"].sum())
    obs = counts["n"].to_numpy(dtype=np.float64) / total
    tgt = np.asarray(
        [float(target.get(g, 0.0)) for g in counts[group_col]],
        dtype=np.float64,
    )
    tgt = tgt / tgt.sum() if tgt.sum() > 0 else tgt
    with np.errstate(divide="ignore", invalid="ignore"):
        raw = np.where(obs > 0, tgt / obs, 0.0)
    rate = raw / raw.max() if raw.max() > 0 else raw
    return pd.DataFrame({
        group_col: counts[group_col],
        "n": counts["n"].astype("int64"),
        "observed_frac": round_half_away(obs, ndigits),
        "target_frac": round_half_away(tgt, ndigits),
        "sample_rate": round_half_away(rate, ndigits),
    })


def corpus_funnel(ds, text_col: str = "text", id_col: str = "doc_id",
                  min_chars: int = 100, max_chars: int = 5000,
                  min_alpha: float = 0.55, max_dup_frac: float = 0.5):
    """The composed C4/Gopher-style QUALITY-FILTER FUNNEL: length →
    alphabetic-ratio → repetition → PII, applied cumulatively in ONE
    streaming pass, reporting survivors after each stage — the
    curation report a 100 TB pipeline emits before dedup. Reuses the
    exact tested kernels (quality_score_batch, repetition_stats_batch,
    pii_scan_batch), so each stage's semantics are the ones the
    per-kernel oracles already verify. No shuffle: per-block cumulative
    mask counts → a 5-row aggregate."""
    from ray.data.aggregate import Sum

    stages = ["0_total", "1_len", "2_alpha", "3_repetition", "4_pii"]

    def partial(t: pa.Table) -> pa.Table:
        q = quality_score_batch(t)
        r = repetition_stats_batch(t, text_col, id_col)
        p = pii_scan_batch(t, text_col)
        n = q["n_chars_calc"].to_numpy(zero_copy_only=False)
        alpha = q["alpha_ratio"].to_numpy(zero_copy_only=False)
        dup = r["dup_token_frac"].to_numpy(zero_copy_only=False)
        pii = p["has_pii"].to_numpy(zero_copy_only=False)
        m1 = (n >= min_chars) & (n <= max_chars)
        m2 = m1 & (alpha >= min_alpha)
        m3 = m2 & (dup <= max_dup_frac)
        m4 = m3 & ~pii
        return pa.table({
            "stage": pa.array(stages, pa.string()),
            "n": pa.array([t.num_rows, int(m1.sum()), int(m2.sum()),
                           int(m3.sum()), int(m4.sum())], pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("stage").aggregate(Sum("n", alias_name="n")))
