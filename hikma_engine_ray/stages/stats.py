"""Reference-parity statistics operators (SURVEY.md §2.5 A4/A5, §2.7).

Three reports the reference derives in SQL / driver maps, rebuilt as
combiner-style aggregates (one partial row per key per block — never a
raw-row shuffle):

- **signature_hash clone report** (reference data-loader.ts:191-197,
  PhaseRepository.ts:186-189): ``md5(f"{type}:{name}:{signature}")``
  per function-like node; hash groups with count > 1 are code clones.
- **embedding coverage** (enhanced-search-service.ts:389-435):
  embedded/total counts + ratio per node_type, and the top-20 file
  paths by node count.
- **function complexity** (db/stats.ts:81-172): function count and
  avg/max lines-of-code per (repo, lang) over function-like nodes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

FUNCTION_LIKE = ("Function", "ArrowFunction", "Method", "TestCase")


def add_signature_hash(batch: pa.Table) -> pa.Table:
    """md5(type:name:signature) column (data-loader.ts:193-197)."""
    types = batch["node_type"].to_pylist()
    names = batch["name"].to_pylist()
    sigs = batch["signature"].to_pylist()
    out = np.empty(batch.num_rows, dtype=object)
    for i in range(batch.num_rows):
        key = f"{types[i]}:{names[i] or ''}:{sigs[i] or ''}"
        out[i] = hashlib.md5(key.encode("utf-8", "surrogatepass")).hexdigest()
    return batch.append_column("signature_hash", pa.array(out, pa.string()))


def _function_filter(t: pa.Table) -> pa.Table:
    return t.filter(
        pc.is_in(t["node_type"], value_set=pa.array(list(FUNCTION_LIKE)))
    )


def clone_groups(nodes_ds):
    """signature_hash groups with >1 member → (signature_hash, n_clones,
    example_id). The grouped count is combiner-style; only one partial
    row per hash per block crosses the shuffle."""
    from .agg import grouped_agg

    sigs = nodes_ds.map_batches(
        lambda t: add_signature_hash(_function_filter(t)).select(
            ["signature_hash", "node_id"]
        ),
        batch_format="pyarrow",
    )
    agg = grouped_agg(
        sigs,
        keys=["signature_hash"],
        spec={"n_clones": ("node_id", "count"), "example_id": ("node_id", "min")},
    )
    return agg.filter(expr="n_clones > 1")


def embedding_coverage(nodes_ds):
    """Per-node-type embedded/total counts + coverage ratio, plus an
    'ALL' summary row (enhanced-search-service.ts:389-435)."""
    from .agg import grouped_agg

    def flags(t: pa.Table) -> pa.Table:
        if "embedding" in t.column_names:
            emb = pc.cast(pc.is_valid(t["embedding"]), pa.int64())
        else:
            emb = pa.nulls(t.num_rows, pa.int64()).fill_null(0)
        return pa.table({"node_type": t["node_type"], "has_emb": emb})

    per_type = grouped_agg(
        nodes_ds.map_batches(flags, batch_format="pyarrow"),
        keys=["node_type"],
        spec={"n_total": ("has_emb", "count"), "n_embedded": ("has_emb", "sum")},
    )

    def ratio(t: pa.Table) -> pa.Table:
        r = pc.divide(
            pc.cast(t["n_embedded"], pa.float64()),
            pc.cast(pc.max_element_wise(t["n_total"], 1), pa.float64()),
        )
        return t.append_column("coverage", pc.round(r, ndigits=4))

    return per_type.map_batches(ratio, batch_format="pyarrow")


def top_paths(nodes_ds, k: int = 20):
    """Top-k file paths by node count (the reference's per-file-path
    embedding distribution, enhanced-search-service.ts:420-435)."""
    from .agg import grouped_agg

    counts = grouped_agg(
        nodes_ds.map_batches(
            lambda t: t.filter(pc.is_valid(t["path"])).select(["path", "node_id"]),
            batch_format="pyarrow",
        ),
        keys=["path"],
        spec={"n": ("node_id", "count")},
    )
    from hikma_engine_ray.stages.agg import global_topk

    return global_topk(counts, ["n", "path"], k, descending=[True, False])


def function_complexity(nodes_ds):
    """Function count + avg/max LoC per (repo, lang) — the reference's
    complexity breakdown (db/stats.ts:81-172). LoC = end - start + 1."""
    from .agg import grouped_agg

    def loc(t: pa.Table) -> pa.Table:
        t = _function_filter(t)
        lines = pc.cast(
            pc.add(pc.subtract(t["end_line"], t["start_line"]), 1), pa.int64()
        )
        return pa.table({"repo": t["repo"], "lang": t["lang"], "loc": lines})

    agg = grouped_agg(
        nodes_ds.map_batches(loc, batch_format="pyarrow"),
        keys=["repo", "lang"],
        spec={
            "n_functions": ("loc", "count"),
            "sum_loc": ("loc", "sum"),
            "max_loc": ("loc", "max"),
        },
    )

    def finish(t: pa.Table) -> pa.Table:
        avg = pc.round(
            pc.divide(
                pc.cast(t["sum_loc"], pa.float64()),
                pc.cast(pc.max_element_wise(t["n_functions"], 1), pa.float64()),
            ),
            ndigits=4,
        )
        return pa.table(
            {
                "repo": t["repo"],
                "lang": t["lang"],
                "n_functions": t["n_functions"],
                "avg_loc": avg,
                "max_loc": t["max_loc"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
