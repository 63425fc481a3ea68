"""Exact prefix-filter similarity join (stages/setsim.py) vs an
in-process brute force — completeness is the whole contract, so the
fixture stacks the hostile cases: exact duplicate floods, short
(<k-token) docs, empty docs, singletons, unicode."""

import numpy as np
import pyarrow as pa
import pytest

from hikma_engine_ray.stages.dedup_suite import _shingles, jaccard
from hikma_engine_ray.stages.setsim import jaccard_self_join, prefix_rows

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill and the rain keeps falling"
)


def _corpus():
    rows = []
    # 6 exact duplicates: every pair qualifies (jaccard 1.0)
    for i in range(6):
        rows.append((i, BASE))
    # near-dup: one word swapped
    rows.append((10, BASE.replace("rain", "snow")))
    # disjoint doc
    rows.append((20, "völlig anderer text ohne überschneidung überhaupt "
                     "nichts gemeinsam mit den anderen dokumenten hier"))
    # short docs (<5 tokens → single joined shingle)
    rows.append((30, "alpha beta gamma"))
    rows.append((31, "alpha beta gamma"))
    rows.append((32, "alpha beta"))
    # empty / whitespace-only: no shingles, never paired
    rows.append((40, ""))
    rows.append((41, "   \n\t "))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })


def _brute(table: pa.Table, t: float, k: int = 5):
    sh = {r["doc_id"]: _shingles(r["text"] or "", k) for r in table.to_pylist()}
    ids = sorted(sh)
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            if not sh[a] and not sh[b]:
                continue  # empty docs: excluded by both engine and SQL
            if jaccard(sh[a], sh[b]) >= t:
                out.add((a, b))
    return out


@pytest.mark.parametrize("threshold", [0.5, 0.8, 0.95])
def test_exact_join_matches_bruteforce(ray_session, threshold):
    import ray.data as rd

    table = _corpus()
    got = {
        (r["a"], r["b"])
        for r in jaccard_self_join(rd.from_arrow(table), threshold=threshold).take_all()
    }
    assert got == _brute(table, threshold)


def test_jaccard_values_exact(ray_session):
    import ray.data as rd

    table = _corpus()
    res = {
        (r["a"], r["b"]): r["jaccard"]
        for r in jaccard_self_join(rd.from_arrow(table), threshold=0.5).take_all()
    }
    sh = {r["doc_id"]: _shingles(r["text"] or "") for r in table.to_pylist()}
    for (a, b), v in res.items():
        assert v == pytest.approx(jaccard(sh[a], sh[b]))
    # the duplicate flood really is all-pairs at 1.0
    assert all(res[(a, b)] == 1.0 for a in range(6) for b in range(a + 1, 6))


def test_prefix_rows_lengths():
    """Prefix length = n - ceil(t*n) + 1, per the all-pairs lemma; empty
    docs emit nothing."""
    table = _corpus()
    out = prefix_rows(0.8)( table)
    ids = out["doc_id"].to_pylist()
    assert 40 not in ids and 41 not in ids
    import collections
    cnt = collections.Counter(ids)
    ns = {r["doc_id"]: len(_shingles(r["text"] or "")) for r in table.to_pylist()}
    for did, c in cnt.items():
        n = ns[did]
        assert c == n - int(np.ceil(0.8 * n)) + 1


def test_size_ratio_filter_cuts_candidates():
    """Docs whose sizes alone forbid jaccard >= t never pair — the short
    doc 32 shares no qualifying partner at t=0.95 with 30/31."""
    table = _corpus()
    assert (30, 32) not in _brute(table, 0.95)


def test_containment_paths_equivalent(ray_session):
    """Driver fast path ≡ distributed path ≡ brute force for the
    directed containment join, hostile fixture included."""
    import pandas as pd
    import ray.data as rd

    from hikma_engine_ray.stages.setsim import containment_self_join

    t = _corpus()
    ds = rd.from_arrow(t).repartition(3)

    def run(**kw):
        return (containment_self_join(ds, threshold=0.8, k=5, **kw)
                .to_pandas().sort_values(["a", "b"])
                .reset_index(drop=True).round({"containment": 9}))

    fast = run()
    dist = run(rows_driver_limit=0)
    dist_joined = run(rows_driver_limit=0, pair_driver_limit=0,
                      freq_driver_limit=0)
    pd.testing.assert_frame_equal(fast, dist)
    pd.testing.assert_frame_equal(fast, dist_joined)

    # brute force: directed containment |A∩B|/|A| >= t
    sh = {r["doc_id"]: _shingles(r["text"] or "", 5)
          for r in t.to_pylist()}
    exp = sorted(
        (a, b) for a in sh for b in sh
        if a != b and sh[a]
        and len(sh[a] & sh[b]) / len(sh[a]) >= 0.8
    )
    assert list(map(tuple, fast[["a", "b"]].to_numpy())) == exp


def test_cosine_pairs_matches_serial_reference(ray_session):
    """cosine_pairs (broadcast-matrix blocked matmul) equals the
    direct n^2 numpy computation, under several block layouts, and
    handles the empty input."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hikma_engine_ray.stages.similarity import cosine_pairs

    rng = np.random.RandomState(3)
    n, d = 80, 8
    M = rng.randn(n, d)
    M[5] = M[7] * 2.0          # exact cosine-1 pair
    M[9] = 0.0                 # zero vector (norm guard)
    ids = np.arange(100, 100 + n, dtype=np.int64)
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
    Mn[9] = 0.0
    S = Mn @ Mn.T
    iu = np.triu_indices(n, k=1)
    want = {(int(ids[a]), int(ids[b]))
            for a, b in zip(*iu) if S[a, b] >= 0.6}
    assert want, "fixture must produce at least one qualifying pair"

    df = pd.DataFrame({"vec_id": ids,
                       "embedding": [[float(x) for x in row] for row in M]})
    for nparts in (1, 4):
        got = cosine_pairs(rd.from_pandas(df).repartition(nparts),
                           threshold=0.6).to_pandas()
        assert set(zip(got["a"], got["b"])) == want

    empty = rd.from_pandas(pd.DataFrame(
        {"vec_id": pd.Series([], dtype="int64"),
         "embedding": pd.Series([], dtype=object)}))
    assert cosine_pairs(empty, threshold=0.5).count() == 0
