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
    find_hot_keys_exact,
    link_bucket,
    link_prescan,
    synthesize_reexports,
)
from ..stages.parser import ParseFiles

import os as _os
import time as _time


def _tick(label: str, t0: list):
    if _os.environ.get("HIKMA_TIMING"):
        import sys as _sys

        now = _time.monotonic()
        # stderr: bench.py's stdout carries exactly one JSON line
        print(f"[timing] {label}: {now - t0[0]:.1f}s", flush=True,
              file=_sys.stderr)
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
TRIPLE_COLS = ["subj", "pred", "obj", "repo", "line", "col",
               "dynamic", "props_json"]
MENTION_COLS = ["repo", "path", "module", "symbol", "mkind", "src_id",
                "src_kind", "line", "col"]
DEF_COLS = ["repo", "module", "symbol", "obj", "def_kind", "commit"]

# driver-memory guard for the def-side semi-join key set (see
# build_graph_from_tagged); tests lower it to force the fallback path
MENTION_FILTER_LIMIT = 20_000_000


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


_PARSE_CACHE: "ParseFiles | None" = None


def parse_files_task(batch: pa.Table) -> pa.Table:
    """Stateless-task parse: file_meta fused in (one stage, no
    intermediate blocks) and the parser instance cached per worker
    process — the same compile-once semantics as the actor pool without
    its spin-up cost or static CPU reservation. Parser state is cheap
    (compiled regexes); heavyweight state (models) still belongs in a
    real actor pool — see stages.embedding.ModelEmbedder."""
    global _PARSE_CACHE
    if _PARSE_CACHE is None:
        _PARSE_CACHE = ParseFiles()
    return _PARSE_CACHE(file_meta_batch(batch))


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
    Parquet-backed variant).

    Default execution is task-based (worker-cached parser): measured at
    num_cpus=32 the fixed actor-pool spin-up plus its static CPU
    reservation cost ~5-7 s that never parallelize — the single largest
    serial term in the scaling budget. Pass ``parse_concurrency`` to get
    the explicit actor-pool form instead."""
    _t = [_time.monotonic()]
    if parse_concurrency is not None:
        meta = corpus_ds.map_batches(file_meta_batch, batch_format="pyarrow")
        tagged = meta.map_batches(
            ParseFiles,
            batch_format="pyarrow",
            batch_size=parse_batch_size,
            concurrency=parse_concurrency,
            num_cpus=1,
        )
    else:
        tagged = corpus_ds.map_batches(
            parse_files_task,
            batch_format="pyarrow",
            batch_size=parse_batch_size,
        )
    tagged = tagged.materialize()
    _tick("parse+materialize", _t)
    return tagged


def _finish_nodes(nodes_raw, embed: bool, embed_provider=None,
                  embed_provider_kwargs: dict | None = None,
                  embed_concurrency=None):
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
        if embed_provider is not None:
            # model-backed provider (ST1): a callable CLASS run as an
            # actor pool — constructor (model load) once per actor,
            # encode per batch. batch_size=32 mirrors the reference's
            # embed-server batching (embedding-service.ts:615-644).
            conc = embed_concurrency or 2
            if not isinstance(conc, tuple):
                conc = (1, int(conc))
            kw = dict(
                batch_format="pyarrow", batch_size=32,
                concurrency=conc,
                fn_constructor_kwargs=embed_provider_kwargs or {},
            )
            main_nodes = main_nodes.map_batches(embed_provider, **kw)
            dup_nodes = dup_nodes.map_batches(embed_provider, **kw)
        else:
            # hash provider is stateless → plain tasks (see
            # hash_embed_batch); no actor spin-up cost
            from ..stages.embedding import hash_embed_batch

            main_nodes = main_nodes.map_batches(
                hash_embed_batch, batch_format="pyarrow", batch_size=2048
            )
            dup_nodes = dup_nodes.map_batches(
                hash_embed_batch, batch_format="pyarrow", batch_size=2048
            )
    return main_nodes.union(dup_nodes)


def nodes_pipeline(tagged, *, embed: bool = True, embed_provider=None,
                   embed_provider_kwargs: dict | None = None,
                   embed_concurrency=None):
    """The node/embedding subtree — depends only on the tagged output,
    NOT on linking/dedup, so callers can consume it concurrently with
    the triple-side phases (bench.py does)."""
    nodes_raw = tagged.map_batches(
        _kind_filter("node", NODE_COLS), batch_format="pyarrow"
    )
    return _finish_nodes(nodes_raw, embed, embed_provider,
                         embed_provider_kwargs, embed_concurrency)


def build_graph(
    corpus_ds: "ray.data.Dataset",
    *,
    nsalt: int = 8,
    hot_threshold: int = 500,
    nbuckets: int | None = None,
    parse_concurrency=None,
    embed_concurrency=None,
    embed: bool = True,
    embed_provider=None,
    embed_provider_kwargs: dict | None = None,
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
        embed_provider=embed_provider,
        embed_provider_kwargs=embed_provider_kwargs,
        adjacency=adjacency,
    )


def build_graph_from_tagged(
    tagged: "ray.data.Dataset",
    *,
    nsalt: int = 8,
    hot_threshold: int = 500,
    nbuckets: int | None = None,
    embed_concurrency=None,
    embed: bool = True,
    embed_provider=None,
    embed_provider_kwargs: dict | None = None,
    adjacency: bool = True,
    materialize_triples: bool = True,
    degree_cap: int | None = 500_000,
) -> dict:
    """Linking + dedup + embedding + adjacency over the parser's tagged
    output (in-memory materialized or read back from a parsed-shard
    checkpoint).

    ``materialize_triples=False`` is the single-consumer streaming mode:
    neither the linked stream nor the final triples are pinned, so the
    whole link→dedup→adjacency chain executes as ONE streaming topology
    with no barriers — right when exactly one consumer drains the
    result (e.g. the bench headline, or a pure-adjacency build). The
    default pins triples for multi-consumer use (sinks + adjacency)."""
    if embed_concurrency is None:
        embed_concurrency = default_parse_concurrency()
    if nbuckets is None:
        # DATA-based shuffle width (~350k tagged rows per bucket,
        # clamped): a fixed bucket count leaves the reduce stages
        # (link_bucket, adjacency _assemble) with ever-fatter straggler
        # tasks as the corpus grows — measured at 800k files the 32-wide
        # adjacency reduce ran 14-24 s per task while most cores idled.
        # Deriving from row count (never CPU count) keeps the plan
        # identical at every parallelism level, which the scaling
        # protocol requires.
        try:
            total = tagged.count()
        except Exception:
            total = 0
        nbuckets = int(min(512, max(32, (total or 0) // 350_000)))

    nodes_raw = tagged.map_batches(_kind_filter("node", NODE_COLS), batch_format="pyarrow")
    triples_local = tagged.map_batches(_kind_filter("triple", TRIPLE_COLS), batch_format="pyarrow")
    mentions = tagged.map_batches(_kind_filter("mention", MENTION_COLS), batch_format="pyarrow")
    defs = tagged.map_batches(_kind_filter("definition", DEF_COLS), batch_format="pyarrow")

    _t = [_time.monotonic()]
    # ---- entity linking (J4): one salted shuffle into bounded buckets.
    # Hot keys come from the parser's folded per-batch partial counts —
    # exact, one cheap pass, no mention sampling; the same pass collects
    # the re-export base set (stages/linking.py).
    # degree estimates ride the same pass ONLY when the streaming
    # adjacency build will need them (it cannot sample a lazy stream)
    streaming_adjacency = adjacency and not materialize_triples
    hot, reex_bases, hot_degree, mention_keys = link_prescan(
        tagged, hot_threshold,
        degree_cap=degree_cap if streaming_adjacency else None)
    # semi-join guard: the mention-key set rides inside every
    # explode_definitions task — past the limit the per-task closure
    # stops being metadata-sized, so fall back to the unfiltered def
    # side (correct either way; the filter is a shuffle-volume cut).
    # At 100 TB the right shape is the distributed bucketed semi-join
    # (stages/joins.bucketed_join) — documented in SCALE.md.
    if len(mention_keys) > MENTION_FILTER_LIMIT:
        mention_keys = None
    _tick("link_prescan", _t)
    if reex_bases:
        # L1b: re-export chains synthesize definition rows (metadata-
        # sized, grouped by repo) that join the linking shuffle unchanged
        defs = defs.union(synthesize_reexports(tagged, reex_bases))
        _tick("synthesize_reexports", _t)
    # 4x buckets per reduce partition (reducers = the repartition(nbuckets)
    # below): sampled shuffle boundaries then never land on the same
    # bucket id, which would create empty zero-schema reduce blocks
    link_buckets = max(nbuckets * 4, 64)
    m_keyed = mentions.map_batches(
        explode_mentions(hot, nsalt, link_buckets), batch_format="pyarrow"
    )
    d_keyed = defs.map_batches(
        explode_definitions(hot, nsalt, link_buckets,
                            mention_keys=mention_keys),
        batch_format="pyarrow",
    )

    # coalesce before the sort shuffle: dozens of full blocks beat
    # hundreds of tiny ones (sort planning/merge cost grows sharply with
    # input block count — removing this measured 2× slower end-to-end)
    linked = (
        m_keyed.union(d_keyed)
        .repartition(nbuckets)
        .groupby("link_bucket")
        .map_groups(link_bucket, batch_format="pandas")
    )
    if materialize_triples:
        linked = linked.materialize()  # consumed twice (triples + dangling)
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
    #   * linked triples: the salt key excludes line/col, so every
    #     mention pair that can emit the same (subj, pred, obj) shares a
    #     link group and dies in link_bucket's in-group dedup — EXCEPT
    #     IMPORTS, where two different specifiers ('./x' vs '../p/x')
    #     from one file can resolve to the same target across different
    #     link keys
    #   * Repository/Commit nodes repeat across batches; all other node
    #     ids are unique by construction
    # The global dedup shuffle therefore carries only HAS_COMMIT rows +
    # linked IMPORTS — kilobytes, not the graph.
    def _pred_split(col_pred: str):
        def fn_factory(want: bool):
            def fn(t: pa.Table) -> pa.Table:
                mask = pc.equal(t["pred"], col_pred)
                return t.filter(mask if want else pc.invert(mask))

            return fn

        return fn_factory

    has_commit = _pred_split("HAS_COMMIT")
    imports = _pred_split("IMPORTS")
    dupable = triples_local.map_batches(has_commit(True), batch_format="pyarrow")
    unique_local = triples_local.map_batches(has_commit(False), batch_format="pyarrow")
    linked_imports = linked_triples.map_batches(imports(True), batch_format="pyarrow")
    linked_rest = linked_triples.map_batches(imports(False), batch_format="pyarrow")
    deduped = dedup_exact(
        dupable.union(linked_imports),
        key_cols=["subj", "pred", "obj"],
        nbuckets=nbuckets,
        sort_cols=["subj", "pred", "obj", "line", "col"],
    )
    triples = unique_local.union(linked_rest).union(deduped)

    nodes = _finish_nodes(nodes_raw, embed, embed_provider,
                          embed_provider_kwargs, embed_concurrency)

    out = {"nodes": nodes, "triples": triples, "dangling": dangling}
    if adjacency:
        if materialize_triples:
            # triples feed both the sink and the adjacency shuffle;
            # coalesce then pin once (a materialized pile of tiny blocks
            # would make the adjacency sort pay per-block overhead)
            triples = triples.repartition(nbuckets).materialize()
            _tick("dedup+materialize-triples", _t)
            out["triples"] = triples
            out["adjacency"] = build_adjacency(
                triples, nbuckets=nbuckets, degree_cap=degree_cap
            )
        else:
            # streaming mode: the adjacency shuffle consumes the RAW
            # (pre-dedup) triple union — duplicates of a triple land in
            # the same (node, dir) reduce group, where _assemble drops
            # them exactly. The global dedup shuffle disappears from the
            # consumed path entirely; `triples` above remains the
            # dedup-correct pipeline for any other consumer. Degree
            # capping can't sample this lazy stream, so the hot-node
            # estimates come from the link-prescan pass over the
            # materialized tagged output (VERDICT r4 item 8) — the
            # parser-local endpoint counts catch the structural heavy
            # hitters (repo / commit / hot external modules).
            raw = triples_local.union(linked_triples)
            out["adjacency"] = build_adjacency(
                raw, nbuckets=nbuckets, degree_cap=degree_cap,
                hot_nodes=hot_degree,
            )
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
        # mask FIRST: Commit rows are a vanishing fraction of the node
        # stream — only the masked slice ever reaches Python (the
        # full-table to_pylist pass here was round-3 VERDICT item 6)
        mask = pc.equal(t["node_type"], "Commit")
        idx = pc.indices_nonzero(mask)
        if len(idx) == 0:
            return t
        meta = ray.get(ref)
        sub = t.select(["repo", "name", "props_json"]).take(idx)
        out = []
        for repo, name, props in zip(
            sub["repo"].to_pylist(), sub["name"].to_pylist(),
            sub["props_json"].to_pylist(),
        ):
            m = meta.get((repo, name))
            out.append(
                json.dumps({"author": m[0], "date": m[1], "message": m[2]},
                           sort_keys=True)
                if m else props
            )
        import numpy as np

        col = t["props_json"].to_numpy(zero_copy_only=False).astype(object)
        col[idx.to_numpy()] = out
        return t.set_column(
            t.schema.get_field_index("props_json"), "props_json",
            pa.array(col, pa.string()),
        )

    authored = pa.Table.from_pylist(
        [
            {
                "subj": f"author:{r.author}", "pred": "AUTHORED",
                "obj": f"commit:{r.commit}", "repo": r.repo,
                "line": None, "col": None, "dynamic": None, "props_json": None,
            }
            for r in commits_df.itertuples(index=False)
        ],
        schema=pa.schema(
            [("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
             ("repo", pa.string()), ("line", pa.int32()), ("col", pa.int32()),
             ("dynamic", pa.bool_()), ("props_json", pa.string())]
        ),
    )
    import ray.data as rd

    graph = dict(graph)
    graph["nodes"] = graph["nodes"].map_batches(enrich, batch_format="pyarrow")
    graph["triples"] = graph["triples"].union(rd.from_arrow(authored))
    return graph


def add_pull_requests(graph: dict, prs: pa.Table, *, embed: bool = True) -> dict:
    """J6: PR table → PullRequest nodes + INCLUDES_COMMIT triples
    (git-analyzer.ts:264-310; the reference's PR source is an
    acknowledged mock, so the table shape — not an API client — is the
    contract here). The PR side is tiny next to the graph: plain Arrow
    build + union, no shuffle. Like ``enrich_commits``, call before
    building adjacency if PR edges should appear there."""
    import json

    import ray.data as rd

    from ..ids import commit_id

    node_rows, triple_rows = [], []
    for r in prs.to_pylist():
        pid = f"pr:{r['repo']}#{r['pr_id']}"
        node_rows.append({
            "node_id": pid, "node_type": "PullRequest", "repo": r["repo"],
            "path": None, "commit": None, "lang": None, "name": r["pr_id"],
            "start_line": None, "end_line": None, "start_col": None,
            "signature": None, "file_type": None, "size_kb": None,
            "content_sha256": None,
            "props_json": json.dumps(
                {"title": r["title"], "author": r["author"],
                 "url": r["url"], "body": r["body"]},
                sort_keys=True,
            ),
        })
        for sha in r["commit_shas"]:
            triple_rows.append({
                "subj": pid, "pred": "INCLUDES_COMMIT",
                "obj": commit_id(sha), "repo": r["repo"],
                "line": None, "col": None, "dynamic": None, "props_json": None,
            })
    node_schema = pa.schema([
        ("node_id", pa.string()), ("node_type", pa.string()),
        ("repo", pa.string()), ("path", pa.string()),
        ("commit", pa.string()), ("lang", pa.string()),
        ("name", pa.string()), ("start_line", pa.int32()),
        ("end_line", pa.int32()), ("start_col", pa.int32()),
        ("signature", pa.string()), ("file_type", pa.string()),
        ("size_kb", pa.float32()), ("content_sha256", pa.string()),
        ("props_json", pa.string()),
    ])
    nodes_t = pa.Table.from_pylist(node_rows, schema=node_schema)
    if embed:
        from ..stages.embedding import hash_embed_batch

        nodes_t = hash_embed_batch(nodes_t)
    triples_t = pa.Table.from_pylist(triple_rows, schema=pa.schema([
        ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
        ("repo", pa.string()), ("line", pa.int32()), ("col", pa.int32()),
        ("dynamic", pa.bool_()), ("props_json", pa.string()),
    ]))
    graph = dict(graph)
    graph["nodes"] = graph["nodes"].union(rd.from_arrow(nodes_t))
    graph["triples"] = graph["triples"].union(rd.from_arrow(triples_t))
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
    # combiner-first: one partial count row per key per block crosses the
    # shuffle (never the table), and the tiny final groupby runs in a
    # single reduce partition — node_type/pred have ~a dozen distinct
    # values, so more reducers only yield empty zero-schema blocks
    from hikma_engine_ray.stages.agg import final_agg, partial_agg

    def _counts(ds, key: str) -> dict:
        spec = {"count()": (key, "count")}
        partials = ds.map_batches(partial_agg([key], spec), batch_format="pyarrow")
        return {
            r[key]: r["count()"]
            for r in final_agg(partials.repartition(1), [key], spec).take_all()
        }

    node_counts = _counts(graph["nodes"], "node_type")
    pred_counts = _counts(graph["triples"], "pred")
    return {"nodes_by_type": node_counts, "triples_by_pred": pred_counts}
