"""curate_corpus: the composed curation chain — stage counts, packing
invariants, resumable partitioned output."""

import os

import pandas as pd


def _docs():
    good = ("the quick brown fox jumps over the lazy dog while rain "
            "keeps falling on the warm windowsill outside the house")
    rows = [
        (1, good + " first version with unique trailing words here"),
        (2, good + " first version with unique trailing words here"),  # dup
        (3, good + " second distinct body of prose for the corpus"),
        (4, "short"),                                   # fails length
        (5, "@@@@ #### %%%% " * 12),                    # fails alpha
        (6, good + " third distinct body with an email a@b.com inside"
            " plus padding words to stay over the length floor"),  # PII
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_curate_stage_counts_and_packing(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from hikma_engine_ray.pipelines.curate import curate_corpus

    ds = rd.from_pandas(_docs()).repartition(2)
    out = str(tmp_path / "curated")
    packed, stats = curate_corpus(ds, min_chars=50, max_chars=5000,
                                  min_alpha=0.7, pack_budget=16,
                                  out_dir=out)
    assert stats["n_input"] == 6
    # doc 4 (length), 5 (alpha), 6 (PII) dropped
    assert stats["n_after_quality"] == 3
    # docs 1, 2 identical -> min-id survivor
    assert stats["n_after_exact_dedup"] == 2
    assert stats["n_docs_final"] == 2
    assert stats["n_packs"] >= 2  # 20+ tokens at budget 16 spills

    df = packed.to_pandas().sort_values("doc_id")
    assert df["doc_id"].tolist() == [1, 3]
    assert (df["n_tokens"] > 0).all()

    # partitioned output + manifest
    assert os.path.isdir(out)
    written = pq.read_table(out)
    assert written.num_rows == 2
    assert "pack_bucket" in written.column_names

    # resume: second run with a complete manifest skips the write
    _, stats2 = curate_corpus(ds, min_chars=50, max_chars=5000,
                              min_alpha=0.7, pack_budget=16,
                              out_dir=out)
    assert stats2["skipped_write"] is True


def test_curate_partial_write_not_doubled(ray_session, tmp_path):
    """A crashed run leaves parquet files but no manifest; the re-run
    must clear them before writing, not append (round-4 ADVICE)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from hikma_engine_ray.pipelines.curate import curate_corpus

    out = str(tmp_path / "curated")
    stale = os.path.join(out, "pack_bucket=0")
    os.makedirs(stale)
    pq.write_table(
        pa.table({"doc_id": pa.array([99], pa.int64()),
                  "text": pa.array(["stale partial row"], pa.string()),
                  "n_tokens": pa.array([3], pa.int64()),
                  "pack_id": pa.array([0], pa.int64())}),
        os.path.join(stale, "leftover.parquet"))

    ds = rd.from_pandas(_docs()).repartition(2)
    _, stats = curate_corpus(ds, min_chars=50, max_chars=5000,
                             min_alpha=0.7, pack_budget=16, out_dir=out)
    assert stats["skipped_write"] is False
    written = pq.read_table(out)
    assert written.num_rows == 2  # stale row gone, no doubling
    assert 99 not in written["doc_id"].to_pylist()


def test_curate_custom_text_col(ray_session):
    """curate_corpus(text_col=...) must apply the quality rules to that
    column (round-4 ADVICE: quality_score_batch hardcoded 'text')."""
    import ray.data as rd

    from hikma_engine_ray.pipelines.curate import curate_corpus

    df = _docs().rename(columns={"text": "body"})
    packed, stats = curate_corpus(
        rd.from_pandas(df).repartition(2), text_col="body",
        min_chars=50, max_chars=5000, min_alpha=0.7, pack_budget=16)
    assert stats["n_after_quality"] == 3
    assert sorted(packed.to_pandas()["doc_id"]) == [1, 3]


def test_curate_lines_removed_stat(ray_session):
    """lines_removed counts duplicate lines cut by line_dedup."""
    import pandas as pd
    import ray.data as rd

    from hikma_engine_ray.pipelines.curate import curate_corpus

    boiler = "this shared header line appears in every document today"
    rows = [
        (1, boiler + "\nunique first body line with plenty of words here"),
        (2, boiler + "\nanother unique body line with plenty of words here"),
        (3, boiler + "\nthird unique body line with plenty of words here"),
    ]
    ds = rd.from_pandas(pd.DataFrame(rows, columns=["doc_id", "text"]))
    _, stats = curate_corpus(ds, min_chars=50, max_chars=5000,
                             min_alpha=0.7, pack_budget=64)
    # the boilerplate line survives in exactly one doc; 2 copies removed
    assert stats["lines_removed"] == 2


def test_curate_minhash_drops_near_dups(ray_session):
    """minhash=True removes verified near-dups (Jaccard >= threshold),
    keeping the min-id member of each cluster; exact non-dups stay."""
    import pandas as pd
    import ray.data as rd

    from hikma_engine_ray.pipelines.curate import curate_corpus

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")
    rows = [
        (1, base + " psi omega one"),
        (2, base + " psi omega two"),      # near-dup of 1 (1 token off)
        (3, base + " psi omega three"),    # near-dup of 1 and 2
        (4, "a wholly different document about rivers mountains and "
            "forests with no overlap to the greek letter sequence at "
            "all beyond english glue words in it"),
    ]
    ds = rd.from_pandas(pd.DataFrame(rows, columns=["doc_id", "text"]))
    packed, stats = curate_corpus(ds, min_chars=50, max_chars=5000,
                                  min_alpha=0.7, pack_budget=256,
                                  minhash=True, minhash_threshold=0.6)
    assert stats["n_after_exact_dedup"] == 4       # no exact dups
    assert stats["n_after_near_dedup"] == 2        # cluster {1,2,3} -> 1
    assert stats["n_near_dup_removed"] == 2
    assert sorted(packed.to_pandas()["doc_id"]) == [1, 4]


def test_curate_minhash_noop_without_near_dups(ray_session):
    """minhash=True on a corpus with no near-dups changes nothing."""
    import ray.data as rd

    from hikma_engine_ray.pipelines.curate import curate_corpus

    ds = rd.from_pandas(_docs()).repartition(2)
    packed, stats = curate_corpus(ds, min_chars=50, max_chars=5000,
                                  min_alpha=0.7, pack_budget=16,
                                  minhash=True, minhash_threshold=0.9)
    assert stats["n_near_dup_removed"] == 0
    assert sorted(packed.to_pandas()["doc_id"]) == [1, 3]


def test_curation_report_rows(ray_session):
    import ray.data as rd

    from hikma_engine_ray.pipelines.curate import curation_report

    ds = rd.from_pandas(_docs()).repartition(2)
    rep = curation_report(ds, min_chars=50, min_alpha=0.7,
                          pack_budget=64).to_pandas()
    got = dict(zip(rep["stage"], rep["n"]))
    assert got["n_input"] == 6
    assert got["n_docs_final"] == 2
