import json
import os
import shutil


def test_resumable_build_skips_completed_shards(ray_session, small_corpus, tmp_path):
    import ray.data as rd

    from hikma_engine_ray.golden import golden_extract
    from hikma_engine_ray.state.checkpoint import (
        build_graph_resumable,
        manifest_complete,
        parse_shard,
    )

    out = str(tmp_path / "out")
    ds = rd.from_arrow(small_corpus)

    # simulate a partial run: only shards 0 and 1 complete, then "killed"
    m0 = parse_shard(ds, out, 0, 4)
    m1 = parse_shard(ds, out, 1, 4)
    assert m0["status"] == "complete" and not m0.get("skipped")
    assert manifest_complete(out, "parsed-0")
    assert not manifest_complete(out, "parsed-2")

    # resume: full build must skip 0/1 and run 2/3
    res = build_graph_resumable(ds, out, nshards=4, embed=False, adjacency=False)
    skipped = [m["shard"] for m in res["manifests"] if m.get("skipped")]
    assert skipped == [0, 1]

    # resumed output equals the golden graph
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(out, "triples"))
    eng = set(zip(t["subj"].to_pylist(), t["pred"].to_pylist(), t["obj"].to_pylist()))
    _, gold, _ = golden_extract(small_corpus)
    assert eng == gold

    # lineage manifests carry the per-partition metadata the north rule asks for
    with open(os.path.join(out, "_manifests", "parsed-2.json")) as f:
        m = json.load(f)
    assert m["path_range"] and m["input_sha_range"] and m["n_files"] > 0
    assert m["repos"]

    # a second resume re-runs nothing — and must NOT append to the final
    # sinks (write_parquet appends uuid-named files; outputs are cleared
    # before rewrite, so counts stay identical)
    res2 = build_graph_resumable(ds, out, nshards=4, embed=False, adjacency=False)
    assert all(m.get("skipped") for m in res2["manifests"])
    assert res2["counts"] == res["counts"]
    t2 = pq.read_table(os.path.join(out, "triples"))
    assert t2.num_rows == t.num_rows


def test_crashed_shard_rerun_does_not_duplicate(ray_session, small_corpus, tmp_path):
    """A shard that crashed after a partial parquet write but before its
    manifest must be re-run cleanly: stale files are cleared, not appended
    to (ADVICE r1 high)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from hikma_engine_ray.state.checkpoint import parse_shard

    out = str(tmp_path / "out")
    ds = rd.from_arrow(small_corpus)

    m_clean = parse_shard(ds, out, 0, 4)
    clean_rows = pq.read_table(os.path.join(out, "parsed", "shard=0")).num_rows

    # simulate the crash: manifest gone, partial parquet left behind
    os.remove(os.path.join(out, "_manifests", "parsed-0.json"))
    m_rerun = parse_shard(ds, out, 0, 4)
    assert not m_rerun.get("skipped")
    assert m_rerun["n_files"] == m_clean["n_files"]
    rerun_rows = pq.read_table(os.path.join(out, "parsed", "shard=0")).num_rows
    assert rerun_rows == clean_rows


def test_manifest_atomicity(tmp_path):
    from hikma_engine_ray.state.checkpoint import manifest_complete, write_manifest

    out = str(tmp_path)
    assert not manifest_complete(out, "x")
    write_manifest(out, "x", {"status": "running"})
    assert not manifest_complete(out, "x")
    write_manifest(out, "x", {"status": "complete"})
    assert manifest_complete(out, "x")
