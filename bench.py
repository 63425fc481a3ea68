"""Benchmark harness (driver contract).

Headline: the flagship KG-construction pipeline over the deterministic
synthetic corpus at the tier matching $GRAFT_SF_DIR, measured as wall
seconds and triples/sec. Also times representative operator queries over
the driver's parquet tables.

Prints exactly ONE JSON line:
  {"metric": ..., "value": sec, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "triples_per_sec": ...}

``--scaling``: runs the same job in two fresh processes at
RAY_GRAFT_CPUS=8 and 32 on the same input and reports both throughputs
plus scaling efficiency (the in-sandbox evidence for the N→4N cluster
criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CORPUS_CACHE = "/tmp/hikma_bench_corpus"

# Healthy host: ~1 GB/s anonymous-page first-touch. The round-3 host
# degradation (3-80 MB/s demand paging, NOTES.md) floors every wall
# clock with a serial fault term, so each bench JSON records the canary
# and the official scaling protocol refuses to certify a number
# measured on a sick host (VERDICT r3 item 3).
CANARY_HEALTHY_MB_S = 500.0

# Healthy host: >= ~1 GB/s PER WORKER of aggregate copy bandwidth under
# parallel load. Round-5 discovery: this VM's parallel memory
# performance detaches from its single-threaded performance — the
# serial canary read a steady ~4 GB/s for hours while an 8-worker
# aggregate copy probe swung 0.3 -> 1.5 -> 23.7 GB/s minute to minute.
# Any multi-CPU wall clock taken in a degraded window measures the
# host, not the code (the 6->24 pair read 0.40 with BOTH canaries_pre
# healthy on the serial probe alone), so the scaling gate requires the
# PARALLEL canary too.
PARALLEL_CANARY_HEALTHY_GB_S = 6.0


def parallel_canary(nworkers: int = 8, mib: int = 256,
                    seconds: float = 4.0) -> float:
    """Aggregate GB/s of parallel memory copies across ``nworkers``
    processes — the dimension of host health the serial page-fault
    canary cannot see (see PARALLEL_CANARY_HEALTHY_GB_S)."""
    import multiprocessing as mp

    def worker(q):
        import numpy as np

        a = np.ones((mib << 20) // 8)
        b = np.empty_like(a)
        t0 = time.monotonic()
        n = 0
        while time.monotonic() - t0 < seconds:
            np.copyto(b, a)
            n += 1
        dt = time.monotonic() - t0
        q.put(n * a.nbytes * 2 / dt)

    # fork, not spawn: spawn re-imports __main__, which breaks under
    # `python -c` (the watcher probes this via -c) and would re-run
    # bench when invoked as a script. No Ray session exists at any
    # parallel_canary call site, so fork is safe.
    ctx = mp.get_context("fork")
    q = ctx.Queue()
    ps = [ctx.Process(target=worker, args=(q,)) for _ in range(nworkers)]
    for p in ps:
        p.start()
    tot = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return round(tot / 1e9, 2)


def page_fault_canary(mib: int = 64) -> float:
    """MB/s of first-touch on freshly-mapped anonymous memory.

    Best of three after a warmup: the FIRST large allocation in a
    fresh process is reproducibly 5-20x slower than steady state
    (~200-900 vs ~4,200 MB/s on a healthy host — allocator/page-table
    warmup, not host paging pressure), so a single cold reading makes
    a healthy host look sick and wrongly trips the scaling gate.
    Sustained host degradation (the round-3/5 9-300 MB/s episodes)
    floors ALL readings, warm ones included, so the best-of-3 still
    catches the condition the gate exists for."""
    import numpy as np

    a = np.ones((8 << 20) // 8)  # warmup: absorb the cold-start cost
    del a
    best = 0.0
    for _ in range(3):
        t0 = time.monotonic()
        a = np.ones((mib << 20) // 8)  # np.ones faults every page
        dt = time.monotonic() - t0
        del a
        best = max(best, mib / dt)
    return round(best, 1)


def _bench_nblocks(n_files: int) -> int:
    """DATA-based block count (~6250 files ≈ 12 MB per block, clamped)
    — identical at every CPU count; see run_bench."""
    return max(32, min(160, n_files // 6250))


def _corpus_path(n_files: int) -> str:
    import pyarrow.parquet as pq

    os.makedirs(CORPUS_CACHE, exist_ok=True)
    if n_files >= 100_000:
        # sharded directory, one shard per planned block: a single file
        # forces a single read task (ReadParquet->SplitBlocks measured
        # ~9 s SERIAL at 800k files) and its post-read splits are uneven
        # (14k-359k rows/task), so parse inherits straggler tasks. Equal
        # row-count shards give a parallel read and even parse tasks.
        path = os.path.join(CORPUS_CACHE, f"corpus_{n_files}_sharded")
        if not os.path.exists(path):
            from hikma_engine_ray.sources.corpus import generate_corpus

            t = generate_corpus(n_files)
            nshards = _bench_nblocks(n_files)
            tmp = path + ".tmp"
            os.makedirs(tmp, exist_ok=True)
            n = t.num_rows
            bounds = [n * i // nshards for i in range(nshards + 1)]
            for i in range(nshards):
                pq.write_table(
                    t.slice(bounds[i], bounds[i + 1] - bounds[i]),
                    os.path.join(tmp, f"part-{i:04d}.parquet"),
                    row_group_size=8192,
                )
            os.rename(tmp, path)
        return path
    path = os.path.join(CORPUS_CACHE, f"corpus_{n_files}.parquet")
    if not os.path.exists(path):
        from hikma_engine_ray.sources.corpus import generate_corpus

        # small row groups: Ray parallelizes a parquet read at row-group
        # granularity — a single default-size group would serialize the
        # whole scan onto one task at every CPU count
        pq.write_table(generate_corpus(n_files), path, row_group_size=8192)
    return path


def run_bench() -> dict:
    import ray

    canary = page_fault_canary()
    # recorded (untimed) so every wall clock in this JSON carries its
    # host context: the round-5 discovery is that parallel memory
    # health detaches from the serial canary (see BASELINE.md) —
    # measured BEFORE ray.init (fork context; no Ray session may exist)
    par_canary = parallel_canary()

    from hikma_engine_ray.tuning import apply_malloc_env

    apply_malloc_env()  # before ray.init: workers inherit via the raylet
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        # default (~43% of RAM) spills under the large scaling corpus's
        # transient embeddings + shuffles; /dev/shm is 126 GiB here.
        # GRAFT_OBJ_STORE overrides for the >=3.2M-file tiers whose
        # pinned parse output alone exceeds 60 GB (identical value at
        # both levels of any scaling pair — it's part of the job spec)
        object_store_memory=int(float(os.environ.get(
            "GRAFT_OBJ_STORE", "60e9"))),
    )
    import ray.data as rd
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    from hikma_engine_ray.tuning import apply_context_defaults

    apply_context_defaults()

    from hikma_engine_ray.pipelines.index_pipeline import (
        build_graph_from_tagged,
        nodes_pipeline,
        parse_corpus,
    )
    from hikma_engine_ray.sources.corpus import corpus_files_for_sf

    n_files = int(
        os.environ.get("GRAFT_BENCH_FILES", corpus_files_for_sf(SF_DIR))
    )
    corpus_path = _corpus_path(n_files)

    # warm the page cache (untimed) so we measure compute + shuffle
    rd.read_parquet(corpus_path).count()

    t0 = time.monotonic()
    # consume subtrees per their TRUE dependency structure: the
    # node/embedding branch needs only the parsed output, so it runs
    # concurrently with linking/dedup/adjacency instead of idling.
    # The triple side is drained ONCE, in streaming mode
    # (materialize_triples=False): link → dedup → adjacency run as one
    # barrier-free topology, and n_triples falls out of the adjacency
    # aggregate (every triple contributes exactly one out-list entry).
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def _out_sizes(t: pa.Table) -> pa.Table:
        return pa.table(
            {"out_degree": pc.cast(pc.list_value_length(t["out"]), pa.int64())}
        )

    streaming = os.environ.get("GRAFT_STREAMING", "1") == "1"
    # DATA-based partitioning (~6250 files ≈ 12 MB per block, clamped),
    # identical at every CPU count — exactly how a fixed input splits on
    # a real cluster at N and 4N nodes. CPU-based splits would hand the
    # small run an artificially cheaper plan and corrupt the scaling
    # measure. (Sweeps at 32 CPUs: the ~50 natural row-group blocks
    # leave cores idle in the last wave; 128 ≈ best at 800k files; 256+
    # pays sharply growing sort-plan cost.)
    nblocks = _bench_nblocks(n_files)
    corpus = rd.read_parquet(corpus_path, override_num_blocks=nblocks)
    tagged = parse_corpus(corpus)
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_n = pool.submit(nodes_pipeline(tagged).count)
        graph = build_graph_from_tagged(
            tagged, embed=False, materialize_triples=not streaming
        )
        row = (
            graph["adjacency"]
            .map_batches(_out_sizes, batch_format="pyarrow")
            .aggregate(Sum("out_degree", alias_name="n_triples"),
                       Count(alias_name="n_adj"))
        )
        n_triples, n_adj = int(row["n_triples"]), int(row["n_adj"])
        n_nodes = f_n.result()
    headline = time.monotonic() - t0

    queries = {}
    if os.environ.get("GRAFT_SKIP_QUERIES") == "1":
        # scaling runs time only the headline job; operator queries are
        # measured by the regular per-round bench
        result = {
            "metric": "kg_build_wall_sec", "value": round(headline, 3),
            "unit": "sec", "queries": queries, "sf": SF_DIR,
            "num_cpus": NUM_CPUS, "corpus_files": n_files,
            "n_triples": n_triples, "n_nodes": n_nodes, "n_adjacency": n_adj,
            "triples_per_sec": round(n_triples / headline, 1),
            "canary_mb_s": canary,
            "parallel_canary_gb_s": par_canary,
        }
        ray.shutdown()
        return result
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    # kg_pagerank runs over the _kg() graph; warm that cache UNTIMED so
    # its entry measures the rank iterations, not a second KG build
    # (the build is already the headline metric above).
    entrymod._kg(SF_DIR)
    for name in (
        "q1_pricing", "orders_by_segment", "events_window", "doc_sha256",
        "token_count", "token_vocab", "doc_sample", "exact_dedup",
        "ann_topk", "minhash_pairs", "dup_clusters", "simhash_pairs",
        "embed_neardup", "bm25_topk", "pii_scan", "hybrid_search",
        "pack_docs", "dedup_delta", "freq_items",
        "dup_ngram_cov", "dedup_cut", "lm_score", "pack_tokens",
        "rollup_revenue",
        "cube_orders", "quantile_filter", "weighted_sample",
        "group_sample", "events_pivot", "events_unpivot",
        "hll_lang_sources", "kll_qty_by_flag",
        "customer_orders_outer", "doc_percentiles", "kg_pagerank",
        "kg_components",
        "top_orders", "events_lagdiff", "events_movavg",
        "sources_by_lang", "entropy_by_lang", "chi2_lang_source",
        "lineitem_mad", "parts_intersect", "parts_except", "tfidf_topk",
        "chunk_docs", "doc_repetition", "mix_weights", "funnel",
        "containment_pairs", "fuzzy_pairs", "khop_reach", "orders_ntile",
        "events_resample", "part_triangles", "price_regression",
        "part_skyline", "pca_embed", "bpe_merges",
        "qty_mode", "user_first_last", "parts_intersect_all",
        "parts_except_all", "doc_shuffle", "line_dedup", "pmi_bigrams",
        "price_histogram", "value_outliers", "overlap_sessions",
        "corpus_funnel", "events_dau", "retention_7d", "sssp_parts",
        "events_cumsum", "label_centroids", "props_stats",
        "revenue_share", "bpe_encode", "top_types_per_user",
        "corpus_curate", "orders_rank", "corpus_curate_neardup",
        "kg_degree_top", "kg_clone_groups",
        # round-5 session-2 additions (new oracle-backed queries)
        "orders_pctrank", "bpe_roundtrip", "minhash_recall",
        "embed_recall", "curate_audit", "kg_ppr", "kg_communities",
        # round-5 session-3 additions
        "kmeans_check", "fingerprint_stable", "semdedup",
    ):
        tq = time.monotonic()
        res = qs[name](SF_DIR)
        if isinstance(res, rd.Dataset):
            res.count()  # consume the lazy pipeline
        queries[name] = round(time.monotonic() - tq, 3)

    result = {
        "metric": "kg_build_wall_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "corpus_files": n_files,
        "n_triples": n_triples,
        "n_nodes": n_nodes,
        "n_adjacency": n_adj,
        "triples_per_sec": round(n_triples / headline, 1),
        "canary_mb_s": canary,
        "parallel_canary_gb_s": par_canary,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job, fresh processes, at N and 4N CPUs (default 6 → 24).

    Uses a larger corpus than the per-round bench (default 800k files,
    override GRAFT_SCALING_FILES): the sf0.1-tier job carries only
    ~160 core-seconds of work, so fixed orchestration (~10 s: session
    init, shuffle barriers) dominates and masks scaling.

    Why 6 → 24 and not 8 → 32 on this 32-core box: at num_cpus=32 the
    Ray driver, raylet, GCS and OS compete with the workers for the
    SAME cores — the top level is oversubscribed in a way a real
    4N-node cluster (per-node raylet, per-node headroom) never is — and
    32-way concurrency on one memory bus loses ~25-30% to bandwidth
    contention (measured with plain parallel processes, no Ray; see
    BASELINE.md). 6 → 24 keeps per-node headroom at both levels and
    measures the PIPELINE's scaling rather than the box's memory bus.
    The 8 → 32 pair is still reported in BASELINE.md for transparency.
    Override with GRAFT_SCALING_LEVELS="8,32"."""
    n_files = int(os.environ.get("GRAFT_SCALING_FILES", "800000"))
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "2"))
    levels = tuple(
        int(x) for x in os.environ.get("GRAFT_SCALING_LEVELS", "6,24").split(",")
    )
    canary_pre = page_fault_canary(256)
    par_pre = parallel_canary()
    if (canary_pre < CANARY_HEALTHY_MB_S
            or par_pre < PARALLEL_CANARY_HEALTHY_GB_S) and os.environ.get(
        "GRAFT_SCALING_FORCE"
    ) != "1":
        # a sick host pays a serialized page-fault floor at BOTH CPU
        # levels, so the computed efficiency measures the host, not the
        # pipeline (round-3 decomposition in BASELINE.md). The parallel
        # canary catches the round-5 failure mode: serial memory healthy
        # while aggregate parallel bandwidth collapses 10-50x. Refuse to
        # certify; GRAFT_SCALING_FORCE=1 overrides for diagnostics.
        return {
            "metric": "scaling_efficiency", "levels": list(levels),
            "skipped": "host_sick", "canary_mb_s_pre": canary_pre,
            "parallel_canary_gb_s_pre": par_pre,
            "canary_healthy_mb_s": CANARY_HEALTHY_MB_S,
            "parallel_canary_healthy_gb_s": PARALLEL_CANARY_HEALTHY_GB_S,
            "sf": SF_DIR,
        }
    _corpus_path(n_files)  # generate once, untimed, shared by both runs
    # best-of-N: this VM shows bursty CPU steal; min wall time is the
    # standard estimator of intrinsic cost under noisy neighbors.
    # SAME repeat count at BOTH levels: under one-sided noise, extra
    # repeats at one level pull its min closer to intrinsic cost and
    # bias the efficiency ratio (round-2 ADVICE) — equal counts keep
    # the estimator symmetric. INTERLEAVED leg order (lo,hi,lo,hi…)
    # rather than per-level blocks: this host's paging throughput
    # drifts on minute timescales (round-4 canary traces), and a
    # blocked order puts the whole drift into ONE level's minimum —
    # interleaving exposes both levels to the same host trajectory
    # (round-5; flicker faster than one leg remains, and is recorded
    # via the per-leg canary readings below).
    times = {}
    leg_canaries = []
    for rep in range(repeats):
        for ncpu in levels:
            env = dict(
                os.environ,
                RAY_GRAFT_CPUS=str(ncpu),
                GRAFT_BENCH_FILES=str(n_files),
                GRAFT_SKIP_QUERIES="1",
            )
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout
            r = json.loads(out.strip().splitlines()[-1])
            leg_canaries.append(
                {"level": ncpu, "rep": rep, "sec": r["value"],
                 "canary_mb_s": r.get("canary_mb_s"),
                 "parallel_canary_gb_s": parallel_canary()})
            best = times.get(ncpu)
            if best is None or r["value"] < best["value"]:
                times[ncpu] = r
    lo, hi = levels
    t_lo, t_hi = times[lo]["value"], times[hi]["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "levels": list(levels),
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        f"triples_per_sec_{lo}": times[lo]["triples_per_sec"],
        f"triples_per_sec_{hi}": times[hi]["triples_per_sec"],
        "speedup": round(t_lo / t_hi, 3),
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
        "canary_mb_s_pre": canary_pre,
        "parallel_canary_gb_s_pre": par_pre,
        "legs": leg_canaries,
        "canary_mb_s_post": page_fault_canary(256),
        "parallel_canary_gb_s_post": parallel_canary(),
    }


if __name__ == "__main__":
    # The driver parses stdout as JSON (round-4 VERDICT item 4): keep
    # fd 1 for the single result line only. Point fd 1 at stderr for
    # the whole run — Ray's raylet/worker chatter and any stray
    # print() inherit it — and write the JSON to the saved real fd.
    real_stdout = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = os.fdopen(os.dup(1), "w")  # keep print() working
    result = run_scaling() if "--scaling" in sys.argv else run_bench()
    os.write(real_stdout, (json.dumps(result) + "\n").encode())
    os.close(real_stdout)
