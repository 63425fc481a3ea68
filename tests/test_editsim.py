"""Edit-distance self-join (stages/editsim): kernel correctness
(banded DP vs full DP, deletion-neighborhood completeness lemma) and
the distributed join vs a brute-force serial reference, across block
layouts."""

import itertools

import numpy as np
import pandas as pd
import pytest

from hikma_engine_ray.stages.editsim import (
    banded_levenshtein,
    deletion_variants,
    edit_distance_self_join,
)


def _full_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _rand_strings(n, rng, alpha="abcd", lo=0, hi=9):
    return ["".join(rng.choice(list(alpha), size=rng.integers(lo, hi)))
            for _ in range(n)]


def test_banded_matches_full_dp():
    rng = np.random.default_rng(7)
    strs = _rand_strings(60, rng)
    for a, b in itertools.combinations(strs, 2):
        full = _full_levenshtein(a, b)
        for d in (1, 2, 3):
            got = banded_levenshtein(a, b, d)
            assert got == (full if full <= d else d + 1), (a, b, d)


def test_deletion_neighborhood_completeness():
    # the lemma: ed(a,b) <= d  =>  D_d(a) ∩ D_d(b) != ∅
    rng = np.random.default_rng(11)
    strs = _rand_strings(80, rng, alpha="abc", lo=0, hi=8)
    for a, b in itertools.combinations(strs, 2):
        for d in (1, 2):
            if _full_levenshtein(a, b) <= d:
                assert deletion_variants(a, d) & deletion_variants(b, d), \
                    (a, b, d)


def test_variant_counts():
    s = "abcdef"
    assert len(deletion_variants(s, 0)) == 1
    assert len(deletion_variants(s, 1)) == 1 + 6
    # distinct chars: 1 + L + C(L,2)
    assert len(deletion_variants(s, 2)) == 1 + 6 + 15


@pytest.mark.parametrize("nblocks", [1, 4])
def test_join_matches_bruteforce(ray_session, nblocks):
    import ray.data as rd

    rng = np.random.default_rng(23)
    adjs = ["cold", "bold", "gold", "cool", "small", "smell"]
    nouns = ["widget", "widgit", "gadget", "bolt", "bolts", "rod"]
    names = [f"{rng.choice(adjs)} {rng.choice(nouns)}" for _ in range(300)]
    df = pd.DataFrame({"p_name": names})
    got = (
        edit_distance_self_join(
            rd.from_pandas(df).repartition(nblocks), max_dist=2,
            str_col="p_name", nbuckets=8)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    uniq = sorted(set(names))
    want_rows = [
        (a, b, _full_levenshtein(a, b))
        for a, b in itertools.combinations(uniq, 2)
        if _full_levenshtein(a, b) <= 2
    ]
    want = pd.DataFrame(want_rows, columns=["a", "b", "dist"]).astype(
        {"dist": "int64"})
    pd.testing.assert_frame_equal(got, want)
    assert len(want) > 0
