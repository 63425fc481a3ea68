"""CLI — user-facing parity with the reference's ``hikma-engine``
commands (embed / search / graph-query, SURVEY.md §3):

    python -m hikma_engine_ray build --corpus DIR_OR_FILE --out DIR [--shards N]
    python -m hikma_engine_ray stats --out DIR
    python -m hikma_engine_ray search --out DIR --query TEXT [-k K]
    python -m hikma_engine_ray calls --out DIR --node NODE_ID
    python -m hikma_engine_ray chain --out DIR --src ID --dst ID
    python -m hikma_engine_ray deps --out DIR --path FILE_PATH
    python -m hikma_engine_ray dedup --docs FILE --out DIR [--threshold J]
    python -m hikma_engine_ray sample --docs FILE --out DIR [--rate R]
    python -m hikma_engine_ray vocab --docs FILE [--top-n N]

The CLI owns its Ray session (library code never calls ray.init).
``build`` is resumable: re-running skips completed shards via the
per-shard manifests.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray():
    import ray

    from .tuning import apply_malloc_env

    apply_malloc_env()  # before ray.init: workers inherit via the raylet
    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .tuning import apply_context_defaults

    apply_context_defaults()


def cmd_build(args):
    import ray.data as rd

    from .state.checkpoint import build_graph_resumable

    _init_ray()
    ds = rd.read_parquet(args.corpus)
    res = build_graph_resumable(ds, args.out, nshards=args.shards)
    print(json.dumps({"out": args.out, "counts": res["counts"],
                      "shards": [
                          {"shard": m["shard"], "skipped": bool(m.get("skipped")),
                           "n_files": m["n_files"]}
                          for m in res["manifests"]
                      ]}, indent=1))


def _read_out(out_dir: str, name: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(out_dir, name))


def cmd_stats(args):
    _init_ray()
    from .pipelines.index_pipeline import graph_stats

    graph = {"nodes": _read_out(args.out, "nodes"),
             "triples": _read_out(args.out, "triples")}
    print(json.dumps(graph_stats(graph), indent=1, sort_keys=True))


def cmd_search(args):
    _init_ray()
    from .pipelines.search import semantic_search

    nodes = _read_out(args.out, "nodes")
    for r in semantic_search(nodes, args.query, k=args.k).take_all():
        print(f"{r['similarity']:.4f}  {r['node_type']:13s} {r['name']}  ({r['path']})")


def cmd_explain(args):
    """RAG read path: top-k search → assembled prompt → provider chain
    (reference `hikma-engine search --explain` analog; EchoProvider
    stands in for the LLM transport — no network here)."""
    _init_ray()
    from .pipelines.rag import ProviderManager, rag_query

    nodes = _read_out(args.out, "nodes")
    row = rag_query(nodes, args.query, k=args.k,
                    manager=ProviderManager()).to_pylist()[0]
    print(json.dumps(row, indent=1))


def cmd_calls(args):
    _init_ray()
    from .pipelines.graph_query import edges_of

    triples = _read_out(args.out, "triples")
    for r in edges_of(triples, args.node, "out", "CALLS").take_all():
        print("→", r["obj"])
    for r in edges_of(triples, args.node, "in", "CALLS").take_all():
        print("←", r["subj"])


def cmd_chain(args):
    _init_ray()
    from .pipelines.graph_query import bfs_chain

    triples = _read_out(args.out, "triples")
    path = bfs_chain(triples, args.src, args.dst, max_hops=args.max_hops)
    if path is None:
        print("no chain found")
        sys.exit(1)
    print(" → ".join(path))


def cmd_deps(args):
    """Files that import the given file path (graph-query.ts:195-207
    `deps <file-path>` parity)."""
    _init_ray()
    from .pipelines.graph_query import file_dependents

    nodes = _read_out(args.out, "nodes")
    triples = _read_out(args.out, "triples")
    rows = file_dependents(nodes, triples, args.path).take_all()
    if not rows:
        print("no dependents found")
        return
    for r in sorted(rows, key=lambda r: (r["repo"], r["path"])):
        print(f"{r['repo']}/{r['path']}")


def cmd_dedup(args):
    """documents parquet → near-dup clusters parquet (minhash-LSH →
    exact-Jaccard verify → connected components)."""
    import ray.data as rd

    _init_ray()
    from .stages.components import dedup_clusters
    from .stages.dedup_suite import minhash_candidates, verify_jaccard_pairs

    ds = rd.read_parquet(args.docs, columns=[args.id_col, args.text_col])
    cand = minhash_candidates(
        ds, k=args.shingle_k, text_col=args.text_col, id_col=args.id_col,
        distinct=False,
    )
    verified = verify_jaccard_pairs(
        cand, ds, threshold=args.threshold, k=args.shingle_k,
        text_col=args.text_col, id_col=args.id_col,
    )
    clusters = dedup_clusters(verified.drop_columns(["jaccard"]))
    clusters.write_parquet(args.out)
    n = rd.read_parquet(args.out).count()
    print(json.dumps({"out": args.out, "clustered_rows": n}))


def cmd_sample(args):
    """Deterministic repeatable sample of a parquet table."""
    import ray.data as rd

    _init_ray()
    from .stages.text import hash_sample

    ds = rd.read_parquet(args.docs)
    out = hash_sample(ds, id_col=args.id_col, rate=args.rate)
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out,
                      "rows": rd.read_parquet(args.out).count()}))


def cmd_vocab(args):
    """Top-N corpus vocabulary (combiner-first token counts)."""
    import ray.data as rd

    _init_ray()
    from .stages.text import token_vocab

    ds = rd.read_parquet(args.docs, columns=[args.text_col])
    for r in token_vocab(ds, text_col=args.text_col, top_n=args.top_n).take_all():
        print(f"{r['n']}\t{r['token']}")


def cmd_curate(args):
    """documents parquet → curated corpus (quality funnel → exact +
    line dedup → packing) as pack-bucket-partitioned parquet with an
    atomic completion manifest."""
    import json

    import ray.data as rd

    _init_ray()
    from .pipelines.curate import curate_corpus

    ds = rd.read_parquet(args.docs, columns=[args.id_col, args.text_col])
    eval_ds = (rd.read_parquet(args.eval, columns=[args.text_col])
               if args.eval else None)
    _, stats = curate_corpus(
        ds, text_col=args.text_col, id_col=args.id_col,
        min_chars=args.min_chars, max_chars=args.max_chars,
        min_alpha=args.min_alpha, eval_ds=eval_ds,
        pack_budget=args.pack_budget, out_dir=args.out,
    )
    print(json.dumps(stats, default=str))


def main(argv=None):
    p = argparse.ArgumentParser(prog="hikma_engine_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="corpus parquet → graph outputs (resumable)")
    b.add_argument("--corpus", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--shards", type=int, default=4)
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("stats")
    s.add_argument("--out", required=True)
    s.set_defaults(fn=cmd_stats)

    q = sub.add_parser("search")
    q.add_argument("--out", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("-k", type=int, default=10)
    q.set_defaults(fn=cmd_search)

    ex = sub.add_parser("explain", help="RAG: search → prompt → provider chain")
    ex.add_argument("--out", required=True)
    ex.add_argument("--query", required=True)
    ex.add_argument("-k", type=int, default=10)
    ex.set_defaults(fn=cmd_explain)

    c = sub.add_parser("calls")
    c.add_argument("--out", required=True)
    c.add_argument("--node", required=True)
    c.set_defaults(fn=cmd_calls)

    ch = sub.add_parser("chain")
    ch.add_argument("--out", required=True)
    ch.add_argument("--src", required=True)
    ch.add_argument("--dst", required=True)
    ch.add_argument("--max-hops", type=int, default=10)
    ch.set_defaults(fn=cmd_chain)

    dp = sub.add_parser("deps", help="files that import the given file path")
    dp.add_argument("--out", required=True)
    dp.add_argument("--path", required=True)
    dp.set_defaults(fn=cmd_deps)

    d = sub.add_parser("dedup", help="documents parquet → near-dup cluster parquet")
    d.add_argument("--docs", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--threshold", type=float, default=0.4)
    d.add_argument("--shingle-k", type=int, default=3)
    d.add_argument("--id-col", default="doc_id")
    d.add_argument("--text-col", default="text")
    d.set_defaults(fn=cmd_dedup)

    sm = sub.add_parser("sample", help="deterministic hash sample → parquet")
    sm.add_argument("--docs", required=True)
    sm.add_argument("--out", required=True)
    sm.add_argument("--rate", type=float, default=0.25)
    sm.add_argument("--id-col", default="doc_id")
    sm.set_defaults(fn=cmd_sample)

    cu = sub.add_parser(
        "curate",
        help="documents parquet → curated+packed corpus (resumable)")
    cu.add_argument("--docs", required=True)
    cu.add_argument("--out", required=True)
    cu.add_argument("--eval", default=None,
                    help="eval parquet for decontamination")
    cu.add_argument("--min-chars", type=int, default=100)
    cu.add_argument("--max-chars", type=int, default=5000)
    cu.add_argument("--min-alpha", type=float, default=0.55)
    cu.add_argument("--pack-budget", type=int, default=256)
    cu.add_argument("--id-col", default="doc_id")
    cu.add_argument("--text-col", default="text")
    cu.set_defaults(fn=cmd_curate)

    v = sub.add_parser("vocab", help="top-N corpus vocabulary to stdout")
    v.add_argument("--docs", required=True)
    v.add_argument("--top-n", type=int, default=50)
    v.add_argument("--text-col", default="text")
    v.set_defaults(fn=cmd_vocab)

    args = p.parse_args(argv)
    args.fn(args)
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
