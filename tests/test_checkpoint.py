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

    # a second resume re-runs nothing
    res2 = build_graph_resumable(ds, out, nshards=4, embed=False, adjacency=False)
    assert all(m.get("skipped") for m in res2["manifests"])


def test_manifest_atomicity(tmp_path):
    from hikma_engine_ray.state.checkpoint import manifest_complete, write_manifest

    out = str(tmp_path)
    assert not manifest_complete(out, "x")
    write_manifest(out, "x", {"status": "running"})
    assert not manifest_complete(out, "x")
    write_manifest(out, "x", {"status": "complete"})
    assert manifest_complete(out, "x")
