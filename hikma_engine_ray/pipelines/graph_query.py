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
              pred: str = "CALLS") -> list[str] | None:
    """Shortest path src → dst over one predicate (graph-query.ts:236-266).

    Distributed frontier expansion: each hop is ONE vectorized pass that
    filters the triples Dataset by the (broadcast) frontier set — the
    driver holds only the visited/parent maps, never the graph. For the
    test-scale graphs the whole expansion is a handful of passes; at
    cluster scale, materialize ``triples`` filtered to the predicate
    first so each hop scans the (much smaller) projection."""
    edges = triples_ds.map_batches(
        lambda t: t.filter(pc.equal(t["pred"], pred)).select(["subj", "obj"]),
        batch_format="pyarrow",
    ).materialize()

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

    return (
        adjacency_ds.map_batches(fn, batch_format="pyarrow")
        .groupby("node_id")
        .aggregate(
            Sum("out_degree", alias_name="out_degree"),
            Sum("in_degree", alias_name="in_degree"),
        )
        .sort(["out_degree", "node_id"], descending=[True, False])
        .limit(20)
    )
