"""Search-side operators (SURVEY.md §2.6 T1-T6, §3.2).

Mirrors the reference's EnhancedSearchService / SearchService read
paths over the materialized ``nodes`` Dataset (with its ``embedding``
column):

  semantic_search      vector top-k + metadata filters + threshold
                       (enhanced-search-service.ts:139-184; J8 filter
                       intersection, search-service.ts:413-425)
  text_search          LIKE filter ordered shortest-source-first
                       (enhanced-search-service.ts:218-242)
  filename_search      name-match ranked before path-match
                       (search-service.ts:874-921)
  fuse_results         weighted multi-source rank fusion with dedup
                       keep-best (search-service.ts:692-779, 928-982;
                       hybrid 70/30 enhanced-search-service.ts:341-384)

Top-k flows: per-block partial top-k → tiny global sort (never a full
sort of the corpus). Fusion operates on ≤ k·#sources rows driver-side,
exactly like the reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.embedding import HashEmbedder


def embed_query(text: str, dim: int = 384) -> np.ndarray:
    """Query-side embedding with the same provider as the index
    (embedding-service.ts:711-721)."""
    return HashEmbedder(dim)._encode([text])[0]


def semantic_search(nodes_ds, query: str, k: int = 10,
                    node_types: list[str] | None = None,
                    path_prefix: str | None = None,
                    min_similarity: float | None = None,
                    include_tests: bool = True):
    """Vector top-k with metadata filter pushdown before scoring."""
    import ray

    q = embed_query(query)
    q_ref = ray.put(q.astype(np.float64))

    def score(t: pa.Table) -> pa.Table:
        mask = pa.array(np.ones(t.num_rows, dtype=bool))
        if node_types:
            mask = pc.and_(mask, pc.is_in(t["node_type"], value_set=pa.array(node_types)))
        if path_prefix is not None:
            mask = pc.and_(mask, pc.fill_null(pc.starts_with(t["path"], path_prefix), False))
        if not include_tests:
            # result-side test filter (enhanced-search-service.ts:568-580)
            mask = pc.and_(mask, pc.invert(pc.equal(t["node_type"], "TestCase")))
        t = t.filter(mask)
        if t.num_rows == 0:
            return pa.table(
                {"node_id": pa.array([], pa.string()),
                 "node_type": pa.array([], pa.string()),
                 "name": pa.array([], pa.string()),
                 "path": pa.array([], pa.string()),
                 "similarity": pa.array([], pa.float64())}
            )
        qv = ray.get(q_ref)
        # zero-copy list-buffer flatten (round-3 VERDICT item 5 idiom) —
        # never a per-row Python materialization of the embeddings
        from ..stages.similarity import _to_matrix

        mat = _to_matrix(t["embedding"]).astype(np.float64, copy=False)
        sims = mat @ qv  # both sides L2-normalized by construction
        order = np.argsort(-sims, kind="stable")[:k]
        out = t.select(["node_id", "node_type", "name", "path"]).take(
            pa.array(order)
        )
        return out.append_column("similarity", pa.array(np.round(sims[order], 6)))

    partials = nodes_ds.map_batches(score, batch_format="pyarrow")
    top = partials.sort(["similarity", "node_id"], descending=[True, False]).limit(k)
    if min_similarity is not None:
        top = top.map_batches(
            lambda t: t.filter(pc.greater_equal(t["similarity"], min_similarity)),
            batch_format="pyarrow",
        )
    return top


def text_search(nodes_ds, needle: str, k: int = 10):
    """Substring match over source text, shortest first."""

    def fn(t: pa.Table) -> pa.Table:
        hay = pc.fill_null(t["source_text"], "")
        t = t.filter(pc.match_substring(hay, needle))
        return pa.table(
            {
                "node_id": t["node_id"],
                "name": t["name"],
                "text_len": pc.cast(pc.utf8_length(pc.fill_null(t["source_text"], "")), pa.int64()),
            }
        )

    return nodes_ds.map_batches(fn, batch_format="pyarrow").sort(
        ["text_len", "node_id"]
    ).limit(k)


def filename_search(nodes_ds, needle: str, k: int = 10):
    """File rows whose NAME matches rank before path-only matches
    (CASE-ordered in the reference, search-service.ts:874-921)."""

    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["node_type"], "File"))
        base = pc.fill_null(t["name"], "")
        path = pc.fill_null(t["path"], "")
        name_hit = pc.match_substring(
            pc.utf8_lower(pc.replace_substring_regex(base, r"^.*/", "")),
            needle.lower(),
        )
        path_hit = pc.match_substring(pc.utf8_lower(path), needle.lower())
        t = t.filter(pc.or_(name_hit, path_hit))
        name_hit2 = pc.match_substring(
            pc.utf8_lower(
                pc.replace_substring_regex(pc.fill_null(t["name"], ""), r"^.*/", "")
            ),
            needle.lower(),
        )
        rank = pc.if_else(name_hit2, pa.scalar(0), pa.scalar(1))
        return pa.table(
            {"node_id": t["node_id"], "path": t["path"],
             "rank": pc.cast(rank, pa.int64())}
        )

    return nodes_ds.map_batches(fn, batch_format="pyarrow").sort(
        ["rank", "path"]
    ).limit(k)


SOURCE_WEIGHTS = {
    # comprehensive-search mix (search-service.ts:692-779)
    "semantic": 0.4,
    "metadata": 0.3,
    "text": 0.2,
    "filename": 0.1,
}


def fuse_results(results: dict[str, pd.DataFrame], k: int = 10) -> pd.DataFrame:
    """Weighted fusion of per-source result frames (each with node_id
    and a ``score`` column in [0,1]); dedup keeps the best-scoring
    occurrence per node (T3/T4 semantics)."""
    frames = []
    for source, df in results.items():
        if df is None or len(df) == 0:
            continue
        f = df.copy()
        f["fused"] = f["score"] * SOURCE_WEIGHTS.get(source, 0.1)
        f["source"] = source
        frames.append(f[["node_id", "fused", "source"]])
    if not frames:
        return pd.DataFrame({"node_id": [], "fused": [], "source": []})
    allr = pd.concat(frames, ignore_index=True)
    allr = allr.sort_values(["fused", "node_id"], ascending=[False, True], kind="stable")
    allr = allr.drop_duplicates(subset=["node_id"], keep="first")
    return allr.head(k).reset_index(drop=True)
