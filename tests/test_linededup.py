"""line_dedup (C4/RefinedWeb line-level dedup): survivor rule, blank
exemption, and broadcast ≡ distributed-join path equivalence."""

import pandas as pd
import pyarrow as pa

from hikma_engine_ray.stages.linededup import line_dedup


def _docs():
    return pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "alpha\nshared line\n\nbeta",      # first occurrence wins
            "shared line\ngamma\nshared line",  # both copies dropped
            "  shared line \ndelta",            # trimmed match dropped
            "",                                  # empty doc: one blank line
        ],
    })


def _run(ds, **kw):
    df = line_dedup(ds, **kw).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    return df


def test_line_dedup_survivor_and_blanks(ray_session):
    import ray.data as rd

    got = _run(rd.from_pandas(_docs()).repartition(3))
    assert got["clean_text"].tolist() == [
        "alpha\nshared line\n\nbeta",  # doc 1 keeps everything
        "gamma",                        # both dup copies removed
        "delta",                        # trimmed form matches -> removed
        "",                             # blank line kept, text intact
    ]
    assert got["n_removed"].tolist() == [0, 2, 1, 0]
    assert got["n_kept"].tolist() == [4, 1, 1, 1]


def test_line_dedup_paths_equivalent(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(_docs()).repartition(3)
    fast = _run(ds)
    slow = _run(ds, driver_limit=-1)  # force the bucketed-join path
    pd.testing.assert_frame_equal(fast, slow)


def test_line_dedup_no_dups_passthrough(ray_session):
    import ray.data as rd

    docs = pd.DataFrame({"doc_id": [7, 8],
                         "text": ["one\ntwo", "three"]})
    got = _run(rd.from_pandas(docs).repartition(2))
    assert got["clean_text"].tolist() == ["one\ntwo", "three"]
    assert got["n_removed"].sum() == 0
