"""Distributed BPE tokenizer TRAINING (public algorithm: Sennrich,
Haddow, Birch 2016 — "Neural Machine Translation of Rare Words with
Subword Units"). The training-data pipeline's missing tokenizer step:
pack_tokens (stages/packing.py) COSTS sequences with a fixed BPE-ish
rule; this stage LEARNS the merge table from the corpus itself.

Shape (the corpus is touched exactly once):

  docs --map_batches--> per-block word-count partials
       --groupby(word) sum--> the WORD TABLE (distinct words + counts;
                              Heaps'-law small relative to the corpus)
  then per merge iteration, over the word table only:
       pair-count partials (combiner) -> groupby(pair) sum
       -> deterministic top-1 (count DESC, pair ASC)  [global_topk]
       -> broadcast merge, rewrite symbol sequences.

Count-guarded like every iteration in this repo: when the word table
fits ``driver_limit`` rows it is collected ONCE and the merge loop is
the classic in-memory algorithm (the overwhelmingly common case —
a 100 TB corpus's distinct-word table is millions of rows, not
billions); past the guard the loop stays fully distributed (two small
executions per merge). Both paths share the same rewrite kernel and
tie-break, equivalence-gated in tests/test_bpe.py.

Determinism: pair selection ties break lexicographically on the pair;
word splitting is the \\S+ rule shared with token_count.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD_RE = re.compile(r"\S+")
_SEP = "\x1f"


def _merge_word(syms: tuple, a: str, b: str, ab: str) -> tuple:
    """Left-to-right non-overlapping replacement of (a, b) -> ab."""
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _pair_counts(words: dict[tuple, int]) -> Counter:
    c: Counter = Counter()
    for syms, cnt in words.items():
        for i in range(len(syms) - 1):
            c[(syms[i], syms[i + 1])] += cnt
    return c


def serial_bpe(word_counts: dict[str, int], n_merges: int):
    """Reference/driver implementation: list of ((a, b), count) in
    merge order."""
    words = {tuple(w): c for w, c in word_counts.items() if w}
    merges = []
    for _ in range(n_merges):
        pairs = _pair_counts(words)
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((a, b, int(cnt)))
        ab = a + b
        words = {_merge_word(s, a, b, ab): c for s, c in words.items()}
        # identical post-merge sequences combine
        combined: dict[tuple, int] = {}
        for s, c in words.items():
            combined[s] = combined.get(s, 0) + c
        words = combined
    return merges


def word_table(ds, text_col: str = "text"):
    """Corpus pass: Dataset (word, c) of distinct-word counts."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t[text_col].to_pylist():
            c.update(_WORD_RE.findall((s or "").lower()))
        if not c:
            return pa.table({"word": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        ws, cs = zip(*c.items())
        return pa.table({"word": pa.array(list(ws), pa.string()),
                         "c": pa.array(list(cs), pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("word").aggregate(Sum("c", alias_name="c")))


def bpe_train(ds, n_merges: int = 40, text_col: str = "text",
              driver_limit: int = 5_000_000):
    """Corpus → ordered merge table as a Dataset
    (rank: int64, left: string, right: string, freq: int64)."""
    import ray.data as rd

    wt = word_table(ds, text_col).materialize()
    if wt.count() == 0:
        merges = []
    elif wt.count() <= driver_limit:
        wc = dict(zip(*(lambda d: (d["word"], d["c"]))(wt.to_pandas())))
        merges = serial_bpe({w: int(c) for w, c in wc.items()}, n_merges)
    else:
        merges = _bpe_train_distributed(wt, n_merges)
    return rd.from_arrow(pa.table({
        "rank": pa.array(np.arange(1, len(merges) + 1), pa.int64()),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string()),
        "freq": pa.array([m[2] for m in merges], pa.int64()),
    }))


def _bpe_train_distributed(wt, n_merges: int):
    """Word table stays a Dataset; two small executions per merge."""
    import ray
    from ray.data.aggregate import Sum

    from .agg import global_topk

    def explode(t: pa.Table) -> pa.Table:
        # symbols as a \x1f-joined string column (stable wire format)
        return pa.table({
            "syms": pa.array(
                [_SEP.join(w) for w in t["word"].to_pylist()], pa.string()),
            "c": t["c"],
        })

    words = wt.map_batches(explode, batch_format="pyarrow").materialize()
    merges = []
    for _ in range(n_merges):
        def pair_partial(t: pa.Table) -> pa.Table:
            c: Counter = Counter()
            for syms, cnt in zip(t["syms"].to_pylist(),
                                 t["c"].to_pylist()):
                parts = syms.split(_SEP)
                for i in range(len(parts) - 1):
                    c[(parts[i], parts[i + 1])] += cnt
            if not c:
                return pa.table({"pair": pa.array([], pa.string()),
                                 "cnt": pa.array([], pa.int64())})
            ks, vs = zip(*c.items())
            return pa.table({
                "pair": pa.array([a + _SEP + b for a, b in ks], pa.string()),
                "cnt": pa.array(list(vs), pa.int64()),
            })

        sums = (words.map_batches(pair_partial, batch_format="pyarrow")
                .groupby("pair").aggregate(Sum("cnt", alias_name="cnt")))
        top = global_topk(sums, ["cnt", "pair"], 1,
                          descending=[True, False]).to_pandas()
        if not len(top):
            break
        a, b = top["pair"].iloc[0].split(_SEP)
        cnt = int(top["cnt"].iloc[0])
        merges.append((a, b, cnt))
        pat, ab = a + _SEP + b, a + b

        def rewrite(t: pa.Table, _a=a, _b=b, _ab=ab) -> pa.Table:
            out = []
            for syms in t["syms"].to_pylist():
                parts = tuple(syms.split(_SEP))
                out.append(_SEP.join(_merge_word(parts, _a, _b, _ab)))
            return pa.table({"syms": pa.array(out, pa.string()),
                             "c": t["c"]})

        words = words.map_batches(rewrite,
                                  batch_format="pyarrow").materialize()
    return merges


# ------------------------------------------------------------- encode

def encode_word(word: str, ranks: dict[tuple, int]) -> tuple:
    """Apply learned merges to one word: repeatedly merge the
    adjacent pair with the LOWEST rank until none applies — the
    standard BPE encode (Sennrich et al. 2016 apply_bpe), and exactly
    the segmentation training would have produced for a word seen at
    training time (merges are replayed in rank order)."""
    syms = tuple(word)
    while len(syms) > 1:
        best_rank, best = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (syms[i], syms[i + 1])
        if best is None:
            break
        syms = _merge_word(syms, best[0], best[1], best[0] + best[1])
    return syms


class BPEEncoder:
    """Actor-pool encode stage (ST pattern): the merge RANK TABLE is
    built once per actor in ``__init__`` from the broadcast merge
    list; ``__call__`` encodes batches with a distinct-word memo —
    Heaps' law means the memo hit rate approaches 1 on a real corpus,
    so the per-word loop runs once per DISTINCT word per actor, not
    per token. Emits (id, n_words, n_subwords)."""

    def __init__(self, merges: list[tuple], text_col: str = "text",
                 id_col: str = "doc_id"):
        self.ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
        self.text_col, self.id_col = text_col, id_col
        self._memo: dict[str, int] = {}

    def _n_subwords(self, word: str) -> int:
        n = self._memo.get(word)
        if n is None:
            n = self._memo[word] = len(encode_word(word, self.ranks))
        return n

    def __call__(self, t: pa.Table) -> pa.Table:
        n_words = np.zeros(t.num_rows, np.int64)
        n_sub = np.zeros(t.num_rows, np.int64)
        for i, s in enumerate(t[self.text_col].to_pylist()):
            ws = _WORD_RE.findall((s or "").lower())
            n_words[i] = len(ws)
            n_sub[i] = sum(self._n_subwords(w) for w in ws)
        return pa.table({
            self.id_col: t[self.id_col],
            "n_words": pa.array(n_words, pa.int64()),
            "n_subwords": pa.array(n_sub, pa.int64()),
        })


def bpe_encode(ds, merges_ds, text_col: str = "text",
               id_col: str = "doc_id", concurrency: int = 4):
    """Corpus + trained merge table → per-doc subword counts. The
    merge table is result-sized by construction (n_merges rows), so
    it drives the actor constructor directly; encoding is a pure
    actor-pool map — no shuffle."""
    mt = merges_ds.to_pandas().sort_values("rank")
    merges = list(zip(mt["left"], mt["right"]))
    return ds.map_batches(
        BPEEncoder, fn_constructor_kwargs={
            "merges": merges, "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency)


class BPERoundtrip:
    """Actor-pool invariant stage: per doc, (a) count words with the
    training tokenizer's own word rule and (b) assert the encode →
    decode identity — concatenating a word's BPE symbols must restore
    the word exactly, with 1 <= n_symbols <= n_chars. The word count is
    independently SQL-recomputable (``\\S+`` tokenization), so a DuckDB
    oracle can hash-check half the row and assert the identity bit for
    the rest — the same driver-checkable-invariant pattern as the
    hll_bound / kll_bound sketch gates. Same memo shape as
    :class:`BPEEncoder` (one encode per distinct word per actor)."""

    def __init__(self, merges: list[tuple], text_col: str = "text",
                 id_col: str = "doc_id"):
        self.ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
        self.text_col, self.id_col = text_col, id_col
        self._memo: dict[str, int] = {}

    def _ok(self, word: str) -> int:
        v = self._memo.get(word)
        if v is None:
            syms = encode_word(word, self.ranks)
            v = self._memo[word] = int(
                "".join(syms) == word and 1 <= len(syms) <= len(word)
            )
        return v

    def __call__(self, t: pa.Table) -> pa.Table:
        n_words = np.zeros(t.num_rows, np.int64)
        ok = np.ones(t.num_rows, np.int64)
        for i, s in enumerate(t[self.text_col].to_pylist()):
            ws = _WORD_RE.findall((s or "").lower())
            n_words[i] = len(ws)
            for w in ws:
                if not self._ok(w):
                    ok[i] = 0
                    break
        return pa.table({
            self.id_col: t[self.id_col],
            "n_words": pa.array(n_words, pa.int64()),
            "ok": pa.array(ok, pa.int64()),
        })


def bpe_roundtrip(ds, merges_ds, text_col: str = "text",
                  id_col: str = "doc_id", concurrency: int = 4):
    """Corpus + trained merge table → per-doc (n_words, roundtrip ok).
    Pure actor-pool map, no shuffle; see :class:`BPERoundtrip`."""
    mt = merges_ds.to_pandas().sort_values("rank")
    merges = list(zip(mt["left"], mt["right"]))
    return ds.map_batches(
        BPERoundtrip, fn_constructor_kwargs={
            "merges": merges, "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency)
