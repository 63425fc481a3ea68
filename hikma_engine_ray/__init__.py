"""hikma_engine_ray — a Ray-Data-native knowledge-graph construction engine.

From-scratch rebuild of the capabilities of foyzulkarim/hikma-engine
(/root/reference, TypeScript, single-process) as an idiomatic Ray Data
pipeline: a streaming ``ray.data.Dataset`` over a Parquet corpus of
source-code files (repo, path, commit, lang, content) runs vectorized
file-metadata projection, an actor-pool AST/heuristic parser, an
entity-linking shuffle with salted keys, content-addressed dedup, and a
deterministic embedding stage, materializing ``nodes``, ``triples`` and
``adjacency`` Parquet outputs with per-partition checkpoint manifests.

Nothing in this package calls ``ray.init()`` — sessions are owned by the
caller (driver / bench.py / test fixture).
"""

__version__ = "0.1.0"
