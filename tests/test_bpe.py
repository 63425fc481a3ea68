"""BPE training (stages/bpe): hand-checked merges on a tiny corpus,
serial ≡ distributed equivalence across layouts, and the corpus query
shape."""

import numpy as np
import pandas as pd
import pytest

from hikma_engine_ray.stages.bpe import (
    _merge_word,
    bpe_train,
    serial_bpe,
)


def test_merge_word_left_to_right():
    assert _merge_word(tuple("aaa"), "a", "a", "aa") == ("aa", "a")
    assert _merge_word(tuple("abab"), "a", "b", "ab") == ("ab", "ab")
    assert _merge_word(("x",), "a", "b", "ab") == ("x",)


def test_serial_bpe_hand_example():
    # classic Sennrich toy: "low" x5, "lower" x2, "newest" x6, "widest" x3
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = serial_bpe(wc, 4)
    # first merge: 'es' (9) — ('e','s') appears in newest(6)+widest(3)
    assert merges[0] == ("e", "s", 9)
    # second: ('es','t') 9
    assert merges[1] == ("es", "t", 9)
    # third: count ties at 7 ('l','o' in low+lower) vs ... deterministic
    assert merges[2][2] >= merges[3][2]


@pytest.mark.parametrize("nblocks", [1, 5])
def test_distributed_equals_serial(ray_session, nblocks):
    import ray.data as rd

    from hikma_engine_ray.stages.bpe import (
        _bpe_train_distributed,
        word_table,
    )

    rng = np.random.default_rng(41)
    vocab = ["alpha", "alps", "beta", "betray", "gamma", "gamut", "delta"]
    docs = [" ".join(rng.choice(vocab, rng.integers(3, 12)))
            for _ in range(80)]
    ds = rd.from_pandas(pd.DataFrame({"text": docs})).repartition(nblocks)

    # serial (driver path through bpe_train)
    got_serial = bpe_train(ds, n_merges=8).to_pandas()

    # forced distributed path on the same word table
    wt = word_table(ds, "text").materialize()
    dist = _bpe_train_distributed(wt, 8)
    got_dist = pd.DataFrame(dist, columns=["left", "right", "freq"])

    pd.testing.assert_frame_equal(
        got_serial[["left", "right", "freq"]].astype({"freq": "int64"}),
        got_dist.astype({"freq": "int64"}),
    )
    assert len(got_serial) == 8


def test_empty_corpus(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"text": ["", None]}))
    out = bpe_train(ds, n_merges=5).to_pandas()
    assert len(out) == 0


def test_encode_word_sennrich_toy():
    """Merges learned on the classic low/lower/newest/widest toy must
    segment a training word back to its trained form and an unseen
    word greedily by rank."""
    from hikma_engine_ray.stages.bpe import encode_word, serial_bpe

    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = serial_bpe(wc, 10)
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    # training words re-encode to the exact symbols training left
    from hikma_engine_ray.stages.bpe import _merge_word

    words = {w: tuple(w) for w in wc}
    for a, b, _ in merges:
        words = {w: _merge_word(s, a, b, a + b) for w, s in words.items()}
    for w, syms in words.items():
        assert encode_word(w, ranks) == syms, w
    # no merges -> character split
    assert encode_word("abc", {}) == ("a", "b", "c")


def test_bpe_encode_engine_matches_serial(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hikma_engine_ray.stages.bpe import (
        _WORD_RE, bpe_encode, bpe_train, encode_word)

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["low lower newest", "widest newest newest low",
                 "", "LOW WIDEST unseen-word"],
    })
    ds = rd.from_pandas(docs).repartition(2)
    merges_ds = bpe_train(ds, n_merges=8).materialize()
    got = (bpe_encode(ds, merges_ds, concurrency=2).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    mt = merges_ds.to_pandas().sort_values("rank")
    ranks = {(a, b): i for i, (a, b) in
             enumerate(zip(mt["left"], mt["right"]))}
    for _, row in docs.iterrows():
        ws = _WORD_RE.findall(row["text"].lower())
        exp_sub = sum(len(encode_word(w, ranks)) for w in ws)
        g = got[got.doc_id == row["doc_id"]].iloc[0]
        assert g["n_words"] == len(ws)
        assert g["n_subwords"] == exp_sub


def test_bpe_roundtrip_invariant(ray_session):
    """Encode→decode identity holds on hostile inputs (unicode,
    emoji, punctuation runs, empty and null docs), and n_words matches
    the \\S+ rule the SQL oracle recomputes."""
    import pandas as pd
    import ray.data as rd

    from hikma_engine_ray.stages.bpe import (
        _WORD_RE, BPERoundtrip, bpe_roundtrip, bpe_train)

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["low lower newest", "naïve café 💡💡 --- !!?",
                 "", None, "x " * 50 + "日本語 mixé"],
    })
    ds = rd.from_pandas(docs).repartition(2)
    merges_ds = bpe_train(ds, n_merges=6).materialize()
    got = (bpe_roundtrip(ds, merges_ds, concurrency=2).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["ok"].tolist() == [1, 1, 1, 1, 1]
    for _, row in docs.iterrows():
        ws = _WORD_RE.findall((row["text"] or "").lower())
        assert got[got.doc_id == row["doc_id"]].iloc[0]["n_words"] == len(ws)

    # the gate actually fires: a corrupted memo entry flips ok to 0
    enc = BPERoundtrip(merges=[])
    enc._memo["poison"] = 0
    import pyarrow as pa
    out = enc(pa.table({"doc_id": [9], "text": ["a poison pill"]}))
    assert out["ok"].to_pylist() == [0]
