"""The flagship KG-construction pipeline (SURVEY.md §3.1 Ray shape).

    read corpus → file_meta (stateless, vectorized, 1 MiB filter)
                → ParseFiles actor pool (nodes + local triples +
                  mentions + definitions, tagged union)
                → [checkpoint/materialize]
                → entity-linking shuffle (salted hot keys)
                → exact dedup (nodes by id, triples by s/p/o)
                → HashEmbedder actor pool
                → adjacency shuffle
                → partitioned Parquet sinks + per-partition manifests

Mirrors the reference's 4-phase Indexer (PhaseManager.ts:119-135) but as
one streaming Ray Data topology; phase boundaries become checkpointed
datasets instead of SQLite echoes.

The ``content`` column never crosses a shuffle: the parser's tagged
output carries only extracted fields (SURVEY.md §4.2 — keep wide
payloads out of shuffle volume).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.adjacency import build_adjacency
from ..stages.dedup import dedup_exact
from ..stages.embedding import HashEmbedder
from ..stages.file_meta import file_meta_batch
from ..stages.linking import (
    LINKED_SCHEMA,
    explode_definitions,
    explode_mentions,
    find_hot_keys_sampled,
    link_bucket,
)
from ..stages.parser import ParseFiles

import os as _os
import time as _time


def _tick(label: str, t0: list):
    if _os.environ.get("HIKMA_TIMING"):
        now = _time.monotonic()
        print(f"[timing] {label}: {now - t0[0]:.1f}s", flush=True)
        t0[0] = now


def _kind_filter(kind: str, columns: list[str] | None = None):
    def fn(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["kind"], kind))
        return t.select(columns) if columns else t

    return fn


NODE_COLS = [
    "node_id", "node_type", "repo", "path", "commit", "lang", "name",
    "start_line", "end_line", "start_col", "signature", "file_type",
    "size_kb", "content_sha256", "props_json",
]
TRIPLE_COLS = ["subj", "pred", "obj", "repo", "line", "col"]
MENTION_COLS = ["repo", "path", "module", "symbol", "mkind", "src_id",
                "src_kind", "line", "col"]
DEF_COLS = ["repo", "module", "symbol", "obj", "def_kind", "commit"]


def default_parse_concurrency() -> tuple[int, int]:
    """Fixed-size pool (min == max): for a stage that runs tens of
    seconds, an autoscaling pool ramping from 1 leaves most of the node
    idle during ramp-up; spinning the full pool up-front costs ~2 s once.
    Leave 2 CPUs for the read and downstream stages so the pool doesn't
    starve them (pipeline would serialize otherwise)."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    n = max(2, cpus - 2)
    return (n, n)


def parse_corpus(
    corpus_ds: "ray.data.Dataset",
    *,
    parse_concurrency=None,
    parse_batch_size: int = 256,
):
    """Phase 1: corpus → materialized tagged parser output. The barrier
    is deliberate — the parse is the expensive stage and its (much
    smaller, content-free) output feeds four consumers; at cluster scale
    this is the natural checkpoint boundary (state.checkpoint holds the
    Parquet-backed variant)."""
    if parse_concurrency is None:
        parse_concurrency = default_parse_concurrency()
    meta = corpus_ds.map_batches(file_meta_batch, batch_format="pyarrow")
    tagged = meta.map_batches(
        ParseFiles,
        batch_format="pyarrow",
        batch_size=parse_batch_size,
        concurrency=parse_concurrency,
        num_cpus=1,
    )
    _t = [_time.monotonic()]
    tagged = tagged.materialize()
    _tick("parse+materialize", _t)
    return tagged


def _finish_nodes(nodes_raw, embed: bool):
    """Dedup the bounded Repository/Commit stream (sort-free: per-block
    drop-dup → coalesce to one tiny block → final drop-dup; a sort stage
    has seconds of fixed cost) and embed each branch BEFORE the union so
    the map chains fuse (filter→split→embed in one task pipeline, no
    intermediate object-store round-trips)."""

    def _node_split(want_dup: bool):
        def fn(t: pa.Table) -> pa.Table:
            mask = pc.is_in(
                t["node_type"], value_set=pa.array(["Repository", "Commit"])
            )
            return t.filter(mask if want_dup else pc.invert(mask))

        return fn

    def _block_dedup(t: pa.Table) -> pa.Table:
        t = t.sort_by("node_id")
        if t.num_rows > 1:
            keep = pa.chunked_array(
                [pa.array([True]),
                 pc.invert(pc.equal(t["node_id"].slice(1), t["node_id"].slice(0, t.num_rows - 1))).combine_chunks()]
            )
            t = t.filter(keep)
        return t

    dup_nodes = (
        nodes_raw.map_batches(_node_split(True), batch_format="pyarrow")
        .map_batches(_block_dedup, batch_format="pyarrow")
        .repartition(1)
        # batch_size=None: dedup the whole coalesced block in ONE call —
        # the default 4096-row chunking could split the same node_id
        # across chunks and let Repository/Commit duplicates survive
        .map_batches(_block_dedup, batch_format="pyarrow", batch_size=None)
    )
    main_nodes = nodes_raw.map_batches(_node_split(False), batch_format="pyarrow")

    if embed:
        # hash provider is stateless → plain tasks (see hash_embed_batch);
        # a model-backed provider would swap in the HashEmbedder-style
        # actor pool: map_batches(ModelCls, concurrency=N)
        from ..stages.embedding import hash_embed_batch

        main_nodes = main_nodes.map_batches(
            hash_embed_batch, batch_format="pyarrow", batch_size=2048
        )
        dup_nodes = dup_nodes.map_batches(
            hash_embed_batch, batch_format="pyarrow", batch_size=2048
        )
    return main_nodes.union(dup_nodes)


def nodes_pipeline(tagged, *, embed: bool = True):
    """The node/embedding subtree — depends only on the tagged output,
    NOT on linking/dedup, so callers can consume it concurrently with
    the triple-side phases (bench.py does)."""
    nodes_raw = tagged.map_batches(
        _kind_filter("node", NODE_COLS), batch_format="pyarrow"
    )
    return _finish_nodes(nodes_raw, embed)


def build_graph(
    corpus_ds: "ray.data.Dataset",
    *,
    nsalt: int = 8,
    hot_threshold: int = 500,
    nbuckets: int = 32,
    parse_concurrency=None,
    embed_concurrency=None,
    embed: bool = True,
    adjacency: bool = True,
    parse_batch_size: int = 256,
) -> dict:
    """Run the full pipeline; returns dict of lazy/materialized Datasets:
    ``nodes`` (deduped, + embeddings), ``triples`` (deduped),
    ``adjacency``, ``dangling``."""
    tagged = parse_corpus(
        corpus_ds,
        parse_concurrency=parse_concurrency,
        parse_batch_size=parse_batch_size,
    )
    return build_graph_from_tagged(
        tagged,
        nsalt=nsalt,
        hot_threshold=hot_threshold,
        nbuckets=nbuckets,
        embed_concurrency=embed_concurrency,
        embed=embed,
        adjacency=adjacency,
    )


def build_graph_from_tagged(
    tagged: "ray.data.Dataset",
    *,
    nsalt: int = 8,
    hot_threshold: int = 500,
    nbuckets: int = 32,
    embed_concurrency=None,
    embed: bool = True,
    adjacency: bool = True,
) -> dict:
    """Linking + dedup + embedding + adjacency over the parser's tagged
    output (in-memory materialized or read back from a parsed-shard
    checkpoint)."""
    if embed_concurrency is None:
        embed_concurrency = default_parse_concurrency()

    nodes_raw = tagged.map_batches(_kind_filter("node", NODE_COLS), batch_format="pyarrow")
    triples_local = tagged.map_batches(_kind_filter("triple", TRIPLE_COLS), batch_format="pyarrow")
    mentions = tagged.map_batches(_kind_filter("mention", MENTION_COLS), batch_format="pyarrow")
    defs = tagged.map_batches(_kind_filter("definition", DEF_COLS), batch_format="pyarrow")

    _t = [_time.monotonic()]
    # ---- entity linking (J4): one salted shuffle into bounded buckets
    hot = find_hot_keys_sampled(mentions, hot_threshold)
    _tick("find_hot_keys", _t)
    link_buckets = max(nbuckets, 64)
    m_keyed = mentions.map_batches(
        explode_mentions(hot, nsalt, link_buckets), batch_format="pyarrow"
    )
    d_keyed = defs.map_batches(
        explode_definitions(hot, nsalt, link_buckets), batch_format="pyarrow"
    )

    # coalesce before the sort shuffle: dozens of full blocks beat
    # hundreds of tiny ones (sort cost grows with input block count)
    linked = (
        m_keyed.union(d_keyed)
        .repartition(nbuckets)
        .groupby("link_bucket")
        .map_groups(link_bucket, batch_format="pandas")
    )
    linked = linked.materialize()  # small; consumed twice (triples + dangling)
    _tick("linking", _t)

    linked_triples = linked.map_batches(
        _kind_filter("triple", TRIPLE_COLS), batch_format="pyarrow"
    )
    dangling = linked.map_batches(
        _kind_filter("dangling", ["repo", "module", "symbol", "mkind", "src_id", "reason", "line", "col"]),
        batch_format="pyarrow",
    )

    # ---- exact dedup (north rule: hash-partition + per-group first),
    # applied ONLY to streams that can actually contain duplicates:
    #   * parser-local triples are duplicate-free by construction — each
    #     file dedups in-actor, ids are content-addressed, and input rows
    #     are unique by (repo, commit, path) — EXCEPT the per-batch
    #     HAS_COMMIT rows (repeated across batches of the same repo)
    #   * linked triples: two mentions at different sites can resolve to
    #     the same (subj, pred, obj)
    #   * Repository/Commit nodes repeat across batches; all other node
    #     ids are unique by construction
    # Shuffling only these small streams instead of every triple/node
    # turns the dedup from an all-to-all of the whole graph into a
    # kilobyte-scale one.
    def _pred_split(want_dup: bool):
        def fn(t: pa.Table) -> pa.Table:
            mask = pc.equal(t["pred"], "HAS_COMMIT")
            return t.filter(mask if want_dup else pc.invert(mask))

        return fn

    dupable = triples_local.map_batches(_pred_split(True), batch_format="pyarrow")
    unique_local = triples_local.map_batches(_pred_split(False), batch_format="pyarrow")
    deduped = dedup_exact(
        dupable.union(linked_triples),
        key_cols=["subj", "pred", "obj"],
        nbuckets=nbuckets,
        sort_cols=["subj", "pred", "obj", "line", "col"],
    )
    triples = unique_local.union(deduped)

    nodes = _finish_nodes(nodes_raw, embed)

    out = {"nodes": nodes, "triples": triples, "dangling": dangling}
    if adjacency:
        # triples feed both the sink and the adjacency shuffle; coalesce
        # then pin once (a materialized pile of 256 tiny blocks would
        # make the adjacency sort pay per-block overhead)
        triples = triples.repartition(nbuckets).materialize()
        _tick("dedup+materialize-triples", _t)
        out["triples"] = triples
        out["adjacency"] = build_adjacency(triples, nbuckets=nbuckets)
    return out


def enrich_commits(graph: dict, commits_df) -> dict:
    """Fold the git-metadata side table (repo, commit, author, date,
    message — the S4 `git log` analog, git-analyzer.ts:157-191) into the
    graph: Commit node props gain author/date/message (broadcast join —
    the commit table is the small side) and AUTHORED triples
    (author:{name} → commit:{sha}, reference src/types/index.ts:18-29)
    are unioned in."""
    import json

    import ray

    ref = ray.put(
        {
            (r.repo, r.commit): (r.author, r.date, r.message)
            for r in commits_df.itertuples(index=False)
        }
    )

    def enrich(t: pa.Table) -> pa.Table:
        meta = ray.get(ref)
        types = t["node_type"].to_pylist()
        repos = t["repo"].to_pylist()
        names = t["name"].to_pylist()
        props = t["props_json"].to_pylist()
        out = []
        for k in range(t.num_rows):
            if types[k] == "Commit":
                m = meta.get((repos[k], names[k]))
                if m:
                    out.append(
                        json.dumps(
                            {"author": m[0], "date": m[1], "message": m[2]},
                            sort_keys=True,
                        )
                    )
                    continue
            out.append(props[k])
        return t.set_column(
            t.schema.get_field_index("props_json"), "props_json",
            pa.array(out, pa.string()),
        )

    authored = pa.Table.from_pylist(
        [
            {
                "subj": f"author:{r.author}", "pred": "AUTHORED",
                "obj": f"commit:{r.commit}", "repo": r.repo,
                "line": None, "col": None,
            }
            for r in commits_df.itertuples(index=False)
        ],
        schema=pa.schema(
            [("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
             ("repo", pa.string()), ("line", pa.int32()), ("col", pa.int32())]
        ),
    )
    import ray.data as rd

    graph = dict(graph)
    graph["nodes"] = graph["nodes"].map_batches(enrich, batch_format="pyarrow")
    graph["triples"] = graph["triples"].union(rd.from_arrow(authored))
    return graph


def repo_stats(commits_df):
    """A7: per-repo commit stats (git-analyzer.ts:381-400)."""
    g = commits_df.groupby("repo").agg(
        n_commits=("commit", "nunique"),
        n_authors=("author", "nunique"),
        latest=("date", "max"),
    )
    return g.reset_index().sort_values("repo").reset_index(drop=True)


def graph_stats(graph: dict) -> dict:
    """Grouped stats (SURVEY.md §2.5 A3/A4): counts by node_type / pred."""
    node_counts = {
        r["node_type"]: r["count()"]
        for r in graph["nodes"].groupby("node_type").count().take_all()
    }
    pred_counts = {
        r["pred"]: r["count()"]
        for r in graph["triples"].groupby("pred").count().take_all()
    }
    return {"nodes_by_type": node_counts, "triples_by_pred": pred_counts}
