"""pmi_bigrams: counts, doc-boundary masking, PMI values, and the
broadcast ≡ bucketed-join path equivalence."""

import math

import pandas as pd
import pytest

from hikma_engine_ray.stages.collocate import pmi_bigrams


def _corpus():
    # "a b" x3 in doc1, "b a" x1 in doc2; doc boundary between docs
    # must NOT create a ("c", "a") bigram.
    return pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b a b a b c", "b a", "", "   "],
    })


def test_pmi_values_and_boundaries(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(_corpus()).repartition(3)
    got = pmi_bigrams(ds, k=10, min_count=1).to_pandas()
    got = got.set_index(["w1", "w2"])
    # tokens: a,b,a,b,a,b,c | b,a -> n_uni=9, n_bi=7
    # bigrams: (a,b)x3 (b,a)x2+1 (b,c)x1 (cross-doc (c,b) absent)
    assert ("c", "b") not in got.index
    assert got.loc[("a", "b"), "c_xy"] == 3
    assert got.loc[("b", "a"), "c_xy"] == 3
    n_uni, n_bi, ca, cb, cc = 9.0, 7.0, 4.0, 4.0, 1.0
    exp_ab = round(math.log((3 / n_bi) / ((ca / n_uni) * (cb / n_uni))), 6)
    assert got.loc[("a", "b"), "pmi"] == pytest.approx(exp_ab, abs=0)
    exp_bc = round(math.log((1 / n_bi) / ((cb / n_uni) * (cc / n_uni))), 6)
    assert got.loc[("b", "c"), "pmi"] == pytest.approx(exp_bc, abs=0)


def test_pmi_paths_equivalent(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(_corpus()).repartition(3)
    fast = pmi_bigrams(ds, k=10, min_count=1).to_pandas()
    slow = pmi_bigrams(ds, k=10, min_count=1,
                       driver_limit=0).to_pandas()  # force joins
    pd.testing.assert_frame_equal(fast.reset_index(drop=True),
                                  slow.reset_index(drop=True))


def test_pmi_empty_corpus(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": [""]}))
    assert pmi_bigrams(ds, k=5, min_count=1).count() == 0
