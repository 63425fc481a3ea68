"""End-to-end corpus CURATION pipeline: the composed form of the
training-data operators this package ships individually —

    normalize/quality funnel (C4/Gopher rules, one streaming pass)
      → exact full-text dedup (hash-partition + per-group first)
      → optional near-dup removal (banded-LSH candidates → exact
        Jaccard verify → min-id-per-cluster keep, Bloom anti join)
      → corpus-wide line dedup (boilerplate removal, global-first)
      → optional eval-set decontamination (broadcast fingerprints)
      → token counting + sequence packing (distributed prefix scan)
      → partitioned Parquet (one directory per pack bucket) with an
        atomic completion manifest, so a re-run skips finished work.

Every stage reuses the individually-oracle-checked kernel (text.py,
dedup_suite, linededup, decontam, packing) — this module only
composes; it introduces no new semantics. The whole chain is
streaming: the only driver state is the count-guarded broadcast
tables the component stages already document.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def curate_corpus(docs, *, text_col: str = "text",
                  id_col: str = "doc_id",
                  min_chars: int = 100, max_chars: int = 5000,
                  min_alpha: float = 0.55, max_dup_frac: float = 0.5,
                  minhash: bool = False, minhash_threshold: float = 0.8,
                  minhash_k: int = 5,
                  eval_ds=None, pack_budget: int = 256,
                  out_dir: str | None = None):
    """Run the curation chain; returns (curated_dataset, stats dict).
    ``curated_dataset`` columns: (id, text, n_tokens, pack_id).
    With ``minhash=True`` a near-dup leg runs between exact and line
    dedup: banded-LSH candidates → exact n-gram-Jaccard verification
    (≥ ``minhash_threshold``) → union-find clusters; each cluster
    keeps its min-id member and the rest are dropped via the exact
    Bloom anti join (all distributed, count-guarded like the
    component stages). With ``out_dir`` the result is also written as
    Parquet partitioned by ``pack_bucket`` (pack_id // 64) under an
    atomic manifest — calling again with a complete manifest skips
    the write."""
    from ..stages.dedup_suite import exact_dedup
    from ..stages.linededup import line_dedup
    from ..stages.packing import pack_documents
    from ..stages.text import (pii_scan_batch, quality_score_batch,
                               repetition_stats_batch)

    stats: dict = {}
    stats["n_input"] = docs.count()

    def quality_pass(t: pa.Table) -> pa.Table:
        q = quality_score_batch(t, text_col)
        r = repetition_stats_batch(t, text_col, id_col)
        p = pii_scan_batch(t, text_col)
        n = q["n_chars_calc"].to_numpy(zero_copy_only=False)
        alpha = q["alpha_ratio"].to_numpy(zero_copy_only=False)
        dup = r["dup_token_frac"].to_numpy(zero_copy_only=False)
        pii = p["has_pii"].to_numpy(zero_copy_only=False)
        m = ((n >= min_chars) & (n <= max_chars)
             & (alpha >= min_alpha) & (dup <= max_dup_frac) & ~pii)
        return t.filter(pa.array(m))

    clean = docs.map_batches(quality_pass,
                             batch_format="pyarrow").materialize()
    stats["n_after_quality"] = clean.count()

    deduped = exact_dedup(clean, text_col=text_col,
                          id_col=id_col).materialize()
    stats["n_after_exact_dedup"] = deduped.count()

    if minhash:
        from ..stages.bloom import anti_join
        from ..stages.components import dedup_clusters
        from ..stages.dedup_suite import (minhash_candidates,
                                          verify_jaccard_pairs)

        cands = minhash_candidates(deduped, k=minhash_k,
                                   text_col=text_col, id_col=id_col)
        verified = verify_jaccard_pairs(
            cands, deduped, minhash_threshold, k=minhash_k,
            text_col=text_col, id_col=id_col)
        # dedup_clusters emits only NON-root members (root = min id),
        # so its node column IS the drop set — min-id member survives
        drop = dedup_clusters(
            verified.map_batches(lambda t: t.select(["a", "b"]),
                                 batch_format="pyarrow")
        ).map_batches(
            lambda t: pa.table({id_col: t["node"].cast(pa.int64())}),
            batch_format="pyarrow",
        ).materialize()
        # no verified near-dups → nothing to remove (an empty Dataset
        # has no schema, which the anti-join build can't consume)
        if drop.count() > 0:
            deduped = anti_join(deduped, drop, on=[id_col]).materialize()
        stats["n_after_near_dedup"] = deduped.count()
        stats["n_near_dup_removed"] = (stats["n_after_exact_dedup"]
                                       - stats["n_after_near_dedup"])

    lined = line_dedup(deduped, text_col=text_col, id_col=id_col)
    lined = lined.map_batches(
        lambda t: pa.table({id_col: t[id_col],
                            text_col: t["clean_text"],
                            "__n_removed": t["n_removed"]}),
        batch_format="pyarrow",
    ).materialize()
    stats["lines_removed"] = int(lined.sum("__n_removed") or 0)
    lined = lined.select_columns([id_col, text_col])

    if eval_ds is not None:
        from ..stages.decontam import decontaminate

        flagged = decontaminate(lined, eval_ds, text_col=text_col)
        lined = flagged.filter(expr="contaminated == False") \
            .drop_columns(["contaminated"]).materialize()
        stats["n_after_decontam"] = lined.count()

    packed = pack_documents(lined, pack_budget, text_col=text_col,
                            id_col=id_col).materialize()
    stats["n_docs_final"] = packed.count()
    stats["n_tokens_final"] = int(packed.sum("n_tokens") or 0)
    mx = packed.max("pack_id")
    stats["n_packs"] = int(mx) + 1 if mx is not None else 0

    if out_dir is not None:
        import os

        from ..state.checkpoint import manifest_complete, write_manifest

        already = manifest_complete(out_dir, "curated")
        stats["skipped_write"] = already
        if not already:
            import shutil

            # a crash after a partial write but before the manifest
            # leaves stale uuid-named parquet files; write_parquet
            # APPENDS, so a re-run would silently double rows — clear
            # the data partitions first (checkpoint.py's rule: the
            # atomic manifest is the only completion signal)
            if os.path.isdir(out_dir):
                for entry in os.listdir(out_dir):
                    if entry.startswith("pack_bucket="):
                        shutil.rmtree(os.path.join(out_dir, entry),
                                      ignore_errors=True)
            out = packed.map_batches(
                lambda t: t.append_column(
                    "pack_bucket",
                    pc.cast(pc.divide(t["pack_id"],
                                      pa.scalar(64, pa.int64())),
                            pa.int64())),
                batch_format="pyarrow",
            )
            os.makedirs(out_dir, exist_ok=True)
            out.write_parquet(out_dir, partition_cols=["pack_bucket"])
            write_manifest(out_dir, "curated", {
                "status": "complete",
                **{k: v for k, v in stats.items()
                   if v is not None and k != "skipped_write"}})

    return packed, stats


def curation_report(docs, **kw):
    """Stage-count summary of ``curate_corpus`` as a small Dataset
    (stage, n) — the audit artifact a 100 TB run logs per input
    partition."""
    import ray.data as rd

    _, stats = curate_corpus(docs, **kw)
    rows = [(k, int(v)) for k, v in stats.items()
            if isinstance(v, (int, np.integer))]
    return rd.from_arrow(pa.table({
        "stage": pa.array([k for k, _ in rows], pa.string()),
        "n": pa.array([v for _, v in rows], pa.int64()),
    }))
