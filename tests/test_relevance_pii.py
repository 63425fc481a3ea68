"""Kernel + pipeline tests for the BM25 ranking, PII scan and
stratified sampling operators (the driver also checks each against a
DuckDB oracle at sf0.01 — these pin semantics independently)."""

import hashlib
import math

import numpy as np
import pyarrow as pa
import pytest


def _docs_table(texts):
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )


def _bm25_reference(texts, query, k1=1.2, b=0.75):
    """Independent scalar BM25 (textbook formula, per-doc loops)."""
    toks = [t.strip().lower().split() if t.strip() else [] for t in texts]
    n = len(texts)
    avgdl = sum(len(x) for x in toks) / n
    terms = sorted(set(query.lower().split()))
    df = {q: sum(q in set(x) for x in toks) for q in terms}
    idf = {q: math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5)) for q in terms}
    out = {}
    for i, x in enumerate(toks):
        s = 0.0
        for q in terms:
            tf = x.count(q)
            if tf:
                s += idf[q] * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(x) / avgdl))
        if s > 0:
            out[i] = s
    return out


def test_bm25_matches_reference(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.relevance import bm25_topk

    texts = [
        "hash join window scan",
        "hash hash hash filter",
        "window window sort merge group",
        "unrelated tokens entirely here",
        "join",
        "",
        "   ",
        "hash join window hash join window hash join window longer doc " * 3,
    ]
    ds = rd.from_arrow(_docs_table(texts))
    got = bm25_topk(ds, "hash join window", k=5, ndigits=None)
    ref = _bm25_reference(texts, "hash join window")
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(got["doc_id"]) == [d for d, _ in want]
    np.testing.assert_allclose(
        got["score"].to_numpy(), [s for _, s in want], rtol=1e-12
    )


def test_bm25_partial_topk_equals_global(ray_session):
    """Per-block partial top-k must not drop a global top-k row: run the
    same corpus as 1 block and as many 1-row blocks."""
    import ray.data as rd

    from hikma_engine_ray.stages.relevance import bm25_topk

    texts = [f"hash {'join ' * (i % 7)} pad{i}" for i in range(40)]
    one = bm25_topk(rd.from_arrow(_docs_table(texts)), "hash join", k=7)
    many = bm25_topk(
        rd.from_arrow(_docs_table(texts)).repartition(20), "hash join", k=7
    )
    assert one.equals(many)


def test_bm25_empty_query_and_corpus(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.relevance import bm25_topk

    ds = rd.from_arrow(_docs_table(["a b c"]))
    assert len(bm25_topk(ds, "   ")) == 0
    empty = rd.from_arrow(_docs_table([]))
    assert len(bm25_topk(empty, "a")) == 0


def test_pii_scan_counts():
    from hikma_engine_ray.stages.text import pii_scan_batch

    t = _docs_table(
        [
            "reach me at a.user+tag@example.co.uk and b@x.io",
            "server 192.168.1.1 backup 10.0.0.2",
            "token deadbeefdeadbeefdeadbeefdeadbeef end",   # 32 hex chars
            "short deadbeef is fine; 1.2.3 is not an ip",
            "",
        ]
    )
    out = pii_scan_batch(t)
    assert out["n_emails"].to_pylist() == [2, 0, 0, 0, 0]
    assert out["n_ipv4"].to_pylist() == [0, 2, 0, 0, 0]
    assert out["n_keyish"].to_pylist() == [0, 0, 1, 0, 0]
    assert out["has_pii"].to_pylist() == [True, True, True, False, False]


def test_stratified_sample_rates_and_determinism(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.text import stratified_sample

    n = 4000
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": pa.array(["en" if i % 2 == 0 else "de" for i in range(n)]),
        }
    )
    ds = rd.from_arrow(t)
    got = stratified_sample(ds, "lang", {"en": 0.125}, 0.5).to_pandas()
    again = stratified_sample(ds, "lang", {"en": 0.125}, 0.5).to_pandas()
    assert got.sort_values("doc_id").equals(again.sort_values("doc_id"))
    # exact expectation: membership is a pure function of md5(doc_id)
    expect = {
        i
        for i in range(n)
        if int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16)
        < (32 if i % 2 == 0 else 128)
    }
    assert set(got["doc_id"]) == expect
    en = (got["lang"] == "en").sum()
    de = (got["lang"] == "de").sum()
    assert 0.08 < en / (n / 2) < 0.17      # ~12.5%
    assert 0.42 < de / (n / 2) < 0.58      # ~50%


def test_stratified_rate_bounds(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.text import stratified_sample

    t = pa.table(
        {"doc_id": pa.array(range(64), pa.int64()),
         "lang": pa.array(["en"] * 64)}
    )
    ds = rd.from_arrow(t)
    # rate >= 1.0 keeps everything; rate 0 keeps nothing
    assert stratified_sample(ds, "lang", {"en": 1.0}, 0.0).count() == 64
    assert stratified_sample(ds, "lang", {"en": 0.0}, 1.0).count() == 0


def test_decontaminate_flags_exact_overlap(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.decontam import decontaminate

    ev = _docs_table(["the quick brown fox jumps", "alpha beta gamma"])
    tr = _docs_table(
        [
            "x y the quick brown fox jumps z",     # contains an eval 5-gram
            "quick brown fox appears here only",   # 5-gram never matches
            "alpha beta gamma",                    # short doc, whole-seq shingle
            "alpha beta delta",                    # differs in last token
            "",                                    # empty: never contaminated
        ]
    )
    out = (
        decontaminate(rd.from_arrow(tr), rd.from_arrow(ev), k=5)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["contaminated"].tolist() == [True, False, True, False, False]


def test_decontaminate_drop_and_empty_eval(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.decontam import decontaminate

    tr = _docs_table(["a b c d e", "f g h i j"])
    kept = decontaminate(
        rd.from_arrow(tr), rd.from_arrow(_docs_table(["a b c d e"])), k=5,
        drop=True,
    )
    assert kept.to_pandas()["doc_id"].tolist() == [1]
    # empty eval set: nothing flagged
    none = decontaminate(rd.from_arrow(tr), rd.from_arrow(_docs_table([])), k=5)
    assert none.to_pandas()["contaminated"].tolist() == [False, False]


def test_hybrid_search_rrf_fusion(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.relevance import hybrid_search

    # doc 0: strong in BOTH legs; doc 1: lexical only; vec 2: semantic only
    docs = _docs_table(["hash join hash join", "hash join", "nothing here"])
    emb = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array(
                [[1.0, 0.0], [0.0, 1.0], [0.9, 0.1]],
                pa.list_(pa.float32()),
            ),
        }
    )
    out = hybrid_search(
        rd.from_arrow(docs), rd.from_arrow(emb), "hash join", [1.0, 0.0], k=3
    )
    # semantic leg ranks ALL vectors (cos 0 still places): doc0 rank 1,
    # vec2 rank 2 (cos≈0.994), vec1 rank 3. lexical: doc0 rank 1 (higher
    # tf), doc1 rank 2, doc2 absent. So doc0 = 1/61+1/61, doc1 =
    # 1/62+1/63, doc2 = 1/62 — hand-computed RRF, fused order 0,1,2.
    assert out["doc_id"].tolist() == [0, 1, 2]
    import math
    assert math.isclose(out["rrf"][0], round(2 / 61, 6), abs_tol=1e-9)
    assert math.isclose(out["rrf"][1], round(1 / 62 + 1 / 63, 6), abs_tol=1e-9)
    assert math.isclose(out["rrf"][2], round(1 / 62, 6), abs_tol=1e-9)


def test_pack_documents_prefix_scan(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.packing import pack_documents

    texts = [f"{'tok ' * (i % 9 + 1)}".strip() for i in range(60)]
    tbl = _docs_table(texts)
    # serial reference: exclusive running sum // budget, id order
    toks = [len(t.split()) for t in texts]
    before = np.concatenate(([0], np.cumsum(toks)[:-1]))
    want = (before // 17).tolist()
    for nblocks in (1, 7):
        ds = rd.from_arrow(tbl).repartition(nblocks)
        got = pack_documents(ds, budget=17).to_pandas().sort_values("doc_id")
        assert got["pack_id"].tolist() == want, nblocks
        assert got["n_tokens"].tolist() == toks
    # every pack except possibly the last holds >= budget-overshoot docs:
    # contiguous rule => pack token sums in [budget - max_doc, budget + max_doc]
    sums = got.groupby("pack_id")["n_tokens"].sum()
    assert (sums.iloc[:-1] >= 17 - max(toks) + 1).all()


def test_dedup_delta_against_index(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.dedup_suite import dedup_delta

    # prior corpus content: "a", "b"; delta: one self-dup pair ("c"
    # twice), one doc duplicating prior content ("a"), one new doc
    delta = pa.table(
        {"doc_id": pa.array([10, 11, 12, 13], pa.int64()),
         "text": pa.array(["c", "c", "a", "d"], pa.string())}
    )
    import hashlib
    index = pa.table(
        {"content_md5": pa.array(
            [hashlib.md5(t.encode()).hexdigest() for t in ("a", "b")],
            pa.string())}
    )
    out = (
        dedup_delta(rd.from_arrow(delta), rd.from_arrow(index))
        .to_pandas()
        .sort_values("doc_id")
    )
    # survivors: 10 ("c", min-id of the self-dup) and 13 ("d"); 11 is a
    # delta self-dup, 12 duplicates the prior corpus
    assert out["doc_id"].tolist() == [10, 13]


def test_frequent_items_exact_under_guarantee(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.freq import frequent_items

    texts = [
        "apple " * (10 if i % 2 == 0 else 1) + f"rare{i} banana banana cherry"
        for i in range(200)
    ]
    ds = rd.from_arrow(_docs_table(texts)).repartition(8)
    out = frequent_items(ds, k=3, capacity=64)
    # exact counts: apple 100*10+100*1, banana 2/doc, cherry 1/doc
    assert out.to_dict("records") == [
        {"item": "apple", "n": 1100},
        {"item": "banana", "n": 400},
        {"item": "cherry", "n": 200},
    ]
    assert out["n"].min() > out.attrs["threshold"]
    # block-layout invariance
    one = frequent_items(rd.from_arrow(_docs_table(texts)), k=3, capacity=64)
    assert one.equals(out)


def test_frequent_items_whole_value_mode_and_empty(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.freq import frequent_items

    vals = ["x"] * 5 + ["y"] * 3 + ["z"]
    ds = rd.from_arrow(_docs_table(vals))
    out = frequent_items(ds, k=2, capacity=16, item_fn=lambda v: [v])
    assert out.to_dict("records") == [{"item": "x", "n": 5}, {"item": "y", "n": 3}]
    empty = frequent_items(rd.from_arrow(_docs_table([])), k=2)
    assert len(empty) == 0
