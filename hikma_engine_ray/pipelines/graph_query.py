"""Read-side graph queries over the materialized outputs (SURVEY.md §3.3).

The reference loads the whole graph into driver maps
(in-memory-graph.ts:57-156) and answers: stats, functions-in-file,
calls/callers of a function, call chains (BFS ≤ 10 hops), regex search,
reverse dependencies (graph-query.ts:210-331). Here each query runs as
Dataset operators over the ``nodes``/``triples``/``adjacency`` outputs —
filters push down to Parquet when the inputs come from ``read_parquet``;
only the (small) frontier of a BFS lives on the driver.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def functions_in_file(nodes_ds, repo: str, path: str):
    """FunctionNodes of one file (graph-query.ts:271-275)."""
    kinds = pa.array(["Function", "ArrowFunction", "Method", "TestCase"])

    def fn(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(pc.equal(t["repo"], repo), pc.equal(t["path"], path)),
            pc.is_in(t["node_type"], value_set=kinds),
        )
        return t.filter(mask)

    return nodes_ds.map_batches(fn, batch_format="pyarrow")


def edges_of(triples_ds, node_id: str, direction: str = "out",
             pred: str | None = None):
    """Out- or in-edges of one node (calls/callers, graph-query.ts:210-231)."""
    col = "subj" if direction == "out" else "obj"

    def fn(t: pa.Table) -> pa.Table:
        mask = pc.equal(t[col], node_id)
        if pred is not None:
            mask = pc.and_(mask, pc.equal(t["pred"], pred))
        return t.filter(mask)

    return triples_ds.map_batches(fn, batch_format="pyarrow")


def bfs_chain(triples_ds, src_id: str, dst_id: str, max_hops: int = 10,
              pred: str = "CALLS",
              driver_limit: int = 2_000_000) -> list[str] | None:
    """Shortest path src → dst over one predicate (graph-query.ts:236-266).

    Distributed frontier expansion: each hop is ONE vectorized pass that
    filters the triples Dataset by the (broadcast) frontier set — the
    driver holds only the visited/parent maps, never the graph. For the
    test-scale graphs the whole expansion is a handful of passes; at
    cluster scale, materialize ``triples`` filtered to the predicate
    first so each hop scans the (much smaller) projection.

    Past ``driver_limit`` predicate edges the visited/parent maps are
    no longer driver-safe, so the chain routes through
    ``graphops.bfs_khop`` (exact distributed hop distances) and
    reconstructs ONE shortest path backward with a per-hop exact
    semi-join — the same count-guard pattern as dedup_clusters."""
    edges = triples_ds.map_batches(
        lambda t: t.filter(pc.equal(t["pred"], pred)).select(["subj", "obj"]),
        batch_format="pyarrow",
    ).materialize()
    if edges.count() > driver_limit:
        return _chain_from_distances(edges, src_id, dst_id, max_hops)

    parent: dict[str, str] = {src_id: ""}
    frontier = {src_id}
    for _ in range(max_hops):
        if not frontier:
            return None
        fr = pa.array(sorted(frontier))

        def hop(t: pa.Table, fr=fr) -> pa.Table:
            return t.filter(pc.is_in(t["subj"], value_set=fr))

        step = edges.map_batches(hop, batch_format="pyarrow").take_all()
        nxt: set[str] = set()
        for r in step:
            if r["obj"] not in parent:
                parent[r["obj"]] = r["subj"]
                nxt.add(r["obj"])
        if dst_id in parent:
            path = [dst_id]
            while path[-1] != src_id:
                path.append(parent[path[-1]])
            return list(reversed(path))
        frontier = nxt
    return None


def _chain_from_distances(edges, src_id: str, dst_id: str,
                          max_hops: int) -> list[str] | None:
    """Distributed chain: exact hop distances via bfs_khop, then walk
    backward from dst — each step keeps only predecessors of the
    current node at distance d-1 (one exact Bloom semi-join against
    the distance table) and picks the lexicographically smallest, so
    the path is deterministic. ≤ max_hops small joins total; the
    driver never holds more than one node id."""
    from ..stages.bloom import semi_join
    from ..stages.graphops import bfs_khop

    dist = bfs_khop(edges, [src_id], max_hops,
                    src_col="subj", dst_col="obj").materialize()
    drow = dist.map_batches(
        lambda t: t.filter(pc.equal(t["node"], dst_id)),
        batch_format="pyarrow",
    ).take_all()
    if not drow:
        return None
    path = [dst_id]
    level = int(drow[0]["dist"])
    while level > 0:
        cur = path[-1]
        preds = edges.map_batches(
            lambda t, cur=cur: pa.table(
                {"node": t.filter(pc.equal(t["obj"], cur))["subj"]}),
            batch_format="pyarrow",
        )
        ring = dist.map_batches(
            lambda t, lv=level - 1: t.filter(pc.equal(t["dist"], lv)),
            batch_format="pyarrow",
        )
        best = (semi_join(preds, ring, on=["node"])
                .sort("node").limit(1).take_all())
        if not best:  # unreachable ring — cannot happen for exact dists
            return None
        path.append(best[0]["node"])
        level -= 1
    return list(reversed(path))


def search_nodes(nodes_ds, pattern: str, node_types: list[str] | None = None):
    """Regex name search (graph-query.ts:327-331)."""

    def fn(t: pa.Table) -> pa.Table:
        mask = pc.match_substring_regex(t["name"], pattern)
        if node_types:
            mask = pc.and_(
                mask, pc.is_in(t["node_type"], value_set=pa.array(node_types))
            )
        return t.filter(pc.fill_null(mask, False))

    return nodes_ds.map_batches(fn, batch_format="pyarrow")


def reverse_deps(triples_ds, file_id: str):
    """Files that import a given file (graph-query.ts:280-293)."""
    return edges_of(triples_ds, file_id, direction="in", pred="IMPORTS")


def file_dependents(nodes_ds, triples_ds, path: str):
    """PATH-level reverse dependencies (graph-query.ts:195-207 /
    `deps <file-path>`): resolve the path to its File node id(s) —
    several when the corpus spans repos/commits — then one vectorized
    pass over IMPORTS in-edges, then one pass resolving importer ids
    back to paths. The two broadcast id sets are result-sized (one
    file's ids; its importers), never the graph."""
    target = nodes_ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["node_type"], "File"),
                    pc.equal(t["path"], path))).select(["node_id"]),
        batch_format="pyarrow",
    )
    ids = pa.array(sorted({r["node_id"] for r in target.take_all()}),
                   pa.string())

    importers = triples_ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["pred"], "IMPORTS"),
                    pc.is_in(t["obj"], value_set=ids))).select(["subj"]),
        batch_format="pyarrow",
    )
    imp = pa.array(sorted({r["subj"] for r in importers.take_all()}),
                   pa.string())
    return nodes_ds.map_batches(
        lambda t: t.filter(
            pc.is_in(t["node_id"], value_set=imp)
        ).select(["node_id", "repo", "path"]),
        batch_format="pyarrow",
    )


def degree_stats(adjacency_ds):
    """Top-degree nodes — grouped stats over adjacency (A5-style).
    Sums over degree segments (high-degree nodes materialize as several
    ``(node_id, seg)`` rows — stages/adjacency.py); normal nodes have a
    single segment, so their rows pass through unchanged."""
    from ray.data.aggregate import Sum

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node_id": t["node_id"],
                "out_degree": pc.cast(pc.list_value_length(t["out"]), pa.int64()),
                "in_degree": pc.cast(pc.list_value_length(t["in"]), pa.int64()),
            }
        )

    from ..stages.agg import global_topk

    agged = (
        adjacency_ds.map_batches(fn, batch_format="pyarrow")
        .groupby("node_id")
        .aggregate(
            Sum("out_degree", alias_name="out_degree"),
            Sum("in_degree", alias_name="in_degree"),
        )
    )
    # per-block partial top-k + tiny merge — never a global sort of
    # the full degree table (same shape as every other top-k here)
    return global_topk(agged, ["out_degree", "node_id"], 20,
                       descending=[True, False])
