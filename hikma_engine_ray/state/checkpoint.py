"""Per-partition checkpoint manifests + resumable graph build.

The reference checkpoints per *phase* in a SQLite ``phase_status`` table
(PhaseManager.ts:168-187, PhaseRepository.ts:46-76) — one granule for
the whole corpus. At cluster scale that is useless: this build
checkpoints the expensive stage (parse) per **shard** — a deterministic
hash-partition of the corpus by (repo, path) — and records lineage per
shard: repos touched, path range, row counts, input content-hash range,
wall time. A killed run resumes by skipping every shard whose manifest
is complete (written atomically: tmp file + rename), re-running only the
rest. Deterministic content-addressed ids make re-runs idempotent.

Layout:
    {out}/parsed/shard={i}/*.parquet      tagged parser output
    {out}/_manifests/parsed-{i}.json      lineage + metrics, atomic
    {out}/nodes/, {out}/triples/, {out}/adjacency/, {out}/dangling/
    {out}/_manifests/final.json
"""

from __future__ import annotations

import json
import os
import shutil
import time
import zlib

import pyarrow as pa
import pyarrow.compute as pc


def _manifest_path(out_dir: str, name: str) -> str:
    return os.path.join(out_dir, "_manifests", f"{name}.json")


def manifest_complete(out_dir: str, name: str) -> bool:
    p = _manifest_path(out_dir, name)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            return json.load(f).get("status") == "complete"
    except (json.JSONDecodeError, OSError):
        return False


def write_manifest(out_dir: str, name: str, payload: dict) -> None:
    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    p = _manifest_path(out_dir, name)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, p)  # atomic: a manifest is either absent or complete


def shard_of(repo: str, path: str, nshards: int) -> int:
    return zlib.crc32(f"{repo}\x1f{path}".encode("utf-8", "surrogatepass")) % nshards


def _shard_filter(shard: int, nshards: int):
    def fn(batch: pa.Table) -> pa.Table:
        repo = batch["repo"].to_pylist()
        path = batch["path"].to_pylist()
        mask = pa.array(
            [shard_of(repo[i], path[i], nshards) == shard for i in range(len(repo))]
        )
        return batch.filter(mask)

    return fn


def parse_shard(corpus_ds, out_dir: str, shard: int, nshards: int,
                parse_concurrency=None) -> dict:
    """Parse one corpus shard → tagged parquet + lineage manifest.
    Skips (returns existing manifest) when already complete."""
    from ..pipelines.index_pipeline import parse_files_task
    from ..stages.parser import ParseFiles  # noqa: F401 (actor-pool alt)

    name = f"parsed-{shard}"
    if manifest_complete(out_dir, name):
        with open(_manifest_path(out_dir, name)) as f:
            m = json.load(f)
        m["skipped"] = True
        return m

    t0 = time.monotonic()
    shard_dir = os.path.join(out_dir, "parsed", f"shard={shard}")
    # a crash after a partial parquet write but before the manifest leaves
    # stale files behind; write_parquet APPENDS fresh uuid-named files, so
    # re-running into the same dir would double rows — clear it first (the
    # manifest, written atomically after, is the only completion signal)
    shutil.rmtree(shard_dir, ignore_errors=True)
    tagged = (
        corpus_ds.map_batches(_shard_filter(shard, nshards), batch_format="pyarrow")
        .map_batches(
            parse_files_task,
            batch_format="pyarrow",
            batch_size=256,
        )
    )
    tagged.write_parquet(shard_dir)

    # lineage: repos / path range / content-hash range of this shard's files
    import ray.data as rd

    stat = rd.read_parquet(shard_dir)
    file_rows = stat.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["kind"], "node"), pc.equal(t["node_type"], "File"))
        ).select(["repo", "path", "content_sha256"]),
        batch_format="pyarrow",
    )
    rows = file_rows.take_all()
    repos = sorted({r["repo"] for r in rows})
    paths = sorted(r["path"] for r in rows)
    shas = sorted(r["content_sha256"] for r in rows)
    manifest = {
        "status": "complete",
        "stage": "parse",
        "shard": shard,
        "nshards": nshards,
        "repos": repos,
        "path_range": [paths[0], paths[-1]] if paths else None,
        "input_sha_range": [shas[0], shas[-1]] if shas else None,
        "n_files": len(rows),
        "n_records": stat.count(),
        "wall_sec": round(time.monotonic() - t0, 3),
    }
    write_manifest(out_dir, name, manifest)
    return manifest


def build_graph_resumable(corpus_ds, out_dir: str, *, nshards: int = 4,
                          nsalt: int = 8, hot_threshold: int = 500,
                          nbuckets: int = 32, embed: bool = True,
                          adjacency: bool = True) -> dict:
    """Checkpointed variant of ``build_graph``: parse per shard with
    skip-on-resume, then link/dedup/embed from the parsed parquet and
    write final outputs. Returns {manifests, out_dir, stats}."""
    import ray.data as rd

    from ..pipelines.index_pipeline import (
        MENTION_COLS,
        NODE_COLS,
        TRIPLE_COLS,
        DEF_COLS,
        _kind_filter,
        build_graph_from_tagged,
    )

    manifests = [
        parse_shard(corpus_ds, out_dir, s, nshards) for s in range(nshards)
    ]
    tagged = rd.read_parquet(os.path.join(out_dir, "parsed"))
    graph = build_graph_from_tagged(
        tagged, nsalt=nsalt, hot_threshold=hot_threshold, nbuckets=nbuckets,
        embed=embed, adjacency=adjacency,
    )
    t0 = time.monotonic()
    counts = {}
    # partitioned sinks mirror the reference's per-type tables
    # (data-loader.ts:410-445 / PhaseRepository graph tables): one
    # directory per node_type / pred so readers prune at the path level
    part_cols = {"nodes": ["node_type"], "triples": ["pred"]}
    for name in ("nodes", "triples", "dangling") + (("adjacency",) if adjacency else ()):
        dest = os.path.join(out_dir, name)
        # same append hazard as parse_shard: a re-run (resume, or a second
        # build into an existing out_dir) must overwrite, not append
        shutil.rmtree(dest, ignore_errors=True)
        ds = graph[name]
        if name in part_cols:
            ds.write_parquet(dest, partition_cols=part_cols[name])
        else:
            ds.write_parquet(dest)
        has_files = os.path.isdir(dest) and any(
            f.endswith(".parquet")
            for _, _, files in os.walk(dest)
            for f in files
        )
        counts[name] = rd.read_parquet(dest).count() if has_files else 0
    write_manifest(
        out_dir,
        "final",
        {
            "status": "complete",
            "stage": "final",
            "counts": counts,
            "wall_sec": round(time.monotonic() - t0, 3),
            "shards": [
                {k: m[k] for k in ("shard", "n_files", "wall_sec") if k in m}
                for m in manifests
            ],
        },
    )
    return {"manifests": manifests, "out_dir": out_dir, "counts": counts}
