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
    find_hot_keys,
    link_bucket,
)
from ..stages.parser import ParseFiles


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
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (1, max(2, cpus - 2))


def build_graph(
    corpus_ds: "ray.data.Dataset",
    *,
    nsalt: int = 8,
    hot_threshold: int = 2000,
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
    import ray

    if parse_concurrency is None:
        parse_concurrency = default_parse_concurrency()
    if embed_concurrency is None:
        embed_concurrency = default_parse_concurrency()

    meta = corpus_ds.map_batches(file_meta_batch, batch_format="pyarrow")
    tagged = meta.map_batches(
        ParseFiles,
        batch_format="pyarrow",
        batch_size=parse_batch_size,
        concurrency=parse_concurrency,
        num_cpus=1,
    )
    # Barrier: the parse is the expensive stage; materialize its (much
    # smaller, content-free) output once so the four per-kind consumers
    # don't re-parse. At cluster scale this is the natural checkpoint
    # boundary (see state.checkpoint for the Parquet-backed variant).
    tagged = tagged.materialize()
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
    hot_threshold: int = 2000,
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

    # ---- entity linking (J4): one salted shuffle into bounded buckets
    hot = find_hot_keys(mentions, hot_threshold)
    link_buckets = max(nbuckets, 64)
    m_keyed = mentions.map_batches(
        explode_mentions(hot, nsalt, link_buckets), batch_format="pyarrow"
    )
    d_keyed = defs.map_batches(
        explode_definitions(hot, nsalt, link_buckets), batch_format="pyarrow"
    )

    linked = (
        m_keyed.union(d_keyed)
        .groupby("link_bucket")
        .map_groups(link_bucket, batch_format="pandas")
    )
    linked = linked.materialize()  # small; consumed twice (triples + dangling)

    linked_triples = linked.map_batches(
        _kind_filter("triple", TRIPLE_COLS), batch_format="pyarrow"
    )
    dangling = linked.map_batches(
        _kind_filter("dangling", ["repo", "module", "symbol", "mkind", "src_id", "reason", "line", "col"]),
        batch_format="pyarrow",
    )

    # ---- exact dedup (north rule: hash-partition + per-group first)
    triples = dedup_exact(
        triples_local.union(linked_triples),
        key_cols=["subj", "pred", "obj"],
        nbuckets=nbuckets,
        sort_cols=["subj", "pred", "obj", "line", "col"],
    )
    nodes = dedup_exact(
        nodes_raw,
        key_cols=["node_id"],
        nbuckets=nbuckets,
        sort_cols=["node_id"],
    )

    if embed:
        nodes = nodes.map_batches(
            HashEmbedder,
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=embed_concurrency,
            num_cpus=1,
        )

    out = {"nodes": nodes, "triples": triples, "dangling": dangling}
    if adjacency:
        # triples feed both the sink and the adjacency shuffle; pin once
        triples = triples.materialize()
        out["triples"] = triples
        out["adjacency"] = build_adjacency(triples, nbuckets=nbuckets)
    return out


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
