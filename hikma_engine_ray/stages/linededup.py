"""Line-level exact deduplication (C4 / RefinedWeb-style): every line
whose trimmed text occurs more than once ACROSS the whole corpus is
removed everywhere except its first occurrence (ordered by
(doc_id, line_no)); blank lines are structural and always kept.

This is the standard boilerplate-removal stage of web-scale curation
(RefinedWeb removes duplicated lines/common paragraphs; CCNet dedups
per-paragraph hashes) — distinct from document-level exact dedup
(dedup_suite.exact_dedup) and from substring-span dedup (substr.py):
the unit is the LINE and the survivor rule is global-first.

Ray-Data-first shape (never shuffles document text on the happy path):

  1. One streaming pass over docs: vectorized line split
     (``pc.split_pattern``) → per-line (hash, packed first-occurrence
     key) — per-block Arrow ``group_by`` partials, so the shuffle
     carries ONE row per distinct line per block, never per line.
  2. One ``groupby(hash)`` aggregate: global min occurrence key + total
     count. Lines with count > 1 are the duplicate set — at corpus
     scale this is the boilerplate tail, orders of magnitude smaller
     than the corpus.
  3. Count-guarded broadcast of the duplicate table (sorted uint64
     hashes + winner keys via ``ray.put``): a second streaming pass
     over docs re-derives each line's hash and drops occurrences that
     match a duplicate hash but are not its winner — pure map, zero
     text shuffle. Past ``driver_limit`` the decision runs as bucketed
     joins instead (occurrences × dups on the hash, then drop lists ×
     docs on doc_id) — one text shuffle, still never all-to-all on
     lines.

Line identity is a 64-bit polars hash of the trimmed line (repo-wide
precedent, cf. substr.py grams): a collision could mis-drop one line
pair per ~2^64 distinct-line pairs; a 100 TB run would widen to two
seeded hashes. The survivor key packs (doc_id, line_no) into a
fixed-width decimal string so Ray's ``Min`` aggregate is the
lexicographic (doc_id, line_no) minimum — doc ids must be non-negative
int64, the oracle's ``ORDER BY doc_id, line_no`` tiebreak exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_DOC_W, _LINE_W = 19, 10  # zero-pad widths: int64 doc_id, line_no


def _hash_lines(trimmed: pa.Array) -> np.ndarray:
    """Vectorized uint64 hash of trimmed line strings (polars, seed 0)."""
    import polars as pl

    s = pl.from_arrow(trimmed)
    if isinstance(s, pl.DataFrame):  # chunked input
        s = s.to_series()
    return s.hash(seed=0).to_numpy()


def _explode_lines(t: pa.Table, text_col: str, id_col: str):
    """Split every doc into lines, vectorized. Returns
    (doc_ids_per_line, line_nos (1-based), lines, trimmed, blank_mask,
    hashes) as numpy/arrow arrays over the flattened line stream."""
    texts = pc.fill_null(t[text_col], "")
    lists = pc.split_pattern(texts, "\n").combine_chunks()
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lists)
    doc_ids = t[id_col].to_numpy(zero_copy_only=False)
    if len(doc_ids) and doc_ids.min() < 0:
        raise ValueError("line_dedup requires non-negative doc ids")
    per_line_doc = np.repeat(doc_ids, lens)
    # 1-based line_no within each doc: global arange minus repeated
    # start offsets
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    line_no = (np.arange(int(lens.sum()), dtype=np.int64)
               - np.repeat(starts, lens) + 1)
    trimmed = pc.utf8_trim_whitespace(flat)
    blank = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    hashes = _hash_lines(trimmed)
    return per_line_doc, line_no, flat, blank, hashes


def _pack_keys(doc: np.ndarray, line: np.ndarray) -> np.ndarray:
    """(doc_id, line_no) → fixed-width decimal string, lexicographic
    order == tuple order (both non-negative)."""
    d = np.char.zfill(doc.astype(f"U{_DOC_W}"), _DOC_W)
    ln = np.char.zfill(line.astype(f"U{_LINE_W}"), _LINE_W)
    return np.char.add(d, ln)


def _dup_lines(ds, text_col: str, id_col: str):
    """Dataset of (h: uint64, wkey: str, n: int64) for every line text
    occurring more than once corpus-wide."""
    from ray.data.aggregate import Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        doc, line, _, blank, h = _explode_lines(t, text_col, id_col)
        keep = ~blank
        doc, line, h = doc[keep], line[keep], h[keep]
        wk = _pack_keys(doc, line)
        # int64 bit-view: Ray's sort shuffle keeps native int64 blocks
        # (uint64 keys fall back to pickled-object extension blocks)
        part = pa.table({
            "h": pa.array(h.view(np.int64), pa.int64()),
            "wkey": pa.array(wk, pa.string()),
        })
        agg = part.group_by(["h"]).aggregate(
            [("wkey", "min"), ("wkey", "count")])
        return agg.rename_columns(["h", "wkey", "n"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("wkey", alias_name="wkey"), Sum("n", alias_name="n"))
    )
    return agg.filter(expr="n > 1")


def _rebuild(t: pa.Table, text_col: str, id_col: str,
             drop_of) -> pa.Table:
    """Rebuild each doc dropping the line_nos given by
    ``drop_of(doc_id) -> sorted int array`` (empty for clean docs)."""
    doc, line_no, flat, blank, h = _explode_lines(t, text_col, id_col)
    lines = flat.to_pylist()
    n_docs = t.num_rows
    doc_ids = t[id_col].to_numpy(zero_copy_only=False)
    # per-doc slices of the flat stream
    texts = pc.fill_null(t[text_col], "")
    lens = pc.list_value_length(
        pc.split_pattern(texts, "\n")).to_numpy(zero_copy_only=False)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    out_text, out_kept, out_rm = [], np.empty(n_docs, np.int64), np.empty(
        n_docs, np.int64)
    for i in range(n_docs):
        s, ln = int(starts[i]), int(lens[i])
        drops = drop_of(int(doc_ids[i]))
        if len(drops) == 0:
            out_text.append("\n".join(lines[s:s + ln]))
            out_kept[i], out_rm[i] = ln, 0
            continue
        dset = set(int(x) for x in drops)
        kept = [lines[s + j] for j in range(ln) if (j + 1) not in dset]
        out_text.append("\n".join(kept))
        out_kept[i], out_rm[i] = len(kept), ln - len(kept)
    return pa.table({
        id_col: t[id_col],
        "clean_text": pa.array(out_text, pa.string()),
        "n_kept": pa.array(out_kept, pa.int64()),
        "n_removed": pa.array(out_rm, pa.int64()),
    })


def line_dedup(ds, text_col: str = "text", id_col: str = "doc_id", *,
               driver_limit: int = 2_000_000):
    """Corpus-wide line dedup; returns (id, clean_text, n_kept,
    n_removed). See module docstring for the two decision paths."""
    import ray

    dups = _dup_lines(ds, text_col, id_col).materialize()
    n_dups = dups.count()

    if n_dups <= driver_limit:
        if n_dups:
            from .dedup import collect_arrow

            dt = collect_arrow(dups)
            hs = dt["h"].to_numpy(zero_copy_only=False)
            wk = np.asarray(dt["wkey"].to_pylist(), dtype=object)
            order = np.argsort(hs)
            hs, wk = hs[order], wk[order]
        else:
            hs = np.empty(0, np.int64)
            wk = np.empty(0, object)
        bc = ray.put((hs, wk))

        def decide(t: pa.Table) -> pa.Table:
            h_sorted, w_sorted = ray.get(bc)
            doc, line_no, _, blank, h = _explode_lines(t, text_col, id_col)
            drop = np.zeros(len(h), bool)
            if len(h_sorted):
                nb = ~blank
                pos = np.searchsorted(h_sorted, h[nb].view(np.int64))
                pos[pos >= len(h_sorted)] = 0
                in_dup = h_sorted[pos] == h[nb].view(np.int64)
                sub_drop = np.zeros(nb.sum(), bool)
                if in_dup.any():
                    keys = _pack_keys(doc[nb][in_dup], line_no[nb][in_dup])
                    sub_drop[in_dup] = keys != w_sorted[pos[in_dup]]
                drop[nb] = sub_drop
            per_doc = {}
            if drop.any():
                for d, ln in zip(doc[drop], line_no[drop]):
                    per_doc.setdefault(int(d), []).append(int(ln))
            return _rebuild(t, text_col, id_col,
                            lambda d: per_doc.get(d, ()))

        return ds.map_batches(decide, batch_format="pyarrow")

    # distributed fallback: occurrences × dups on the hash, then
    # per-doc drop lists × docs on the doc id — one text shuffle.
    from .joins import bucketed_join

    def occs(t: pa.Table) -> pa.Table:
        doc, line_no, _, blank, h = _explode_lines(t, text_col, id_col)
        nb = ~blank
        return pa.table({
            "h": pa.array(h[nb].view(np.int64), pa.int64()),
            "o_doc": pa.array(doc[nb], pa.int64()),
            "o_line": pa.array(line_no[nb], pa.int64()),
        })

    occ = ds.map_batches(occs, batch_format="pyarrow")
    joined = bucketed_join(occ, dups.select_columns(["h", "wkey"]),
                           on=["h"])

    def to_drops(t: pa.Table) -> pa.Table:
        keys = _pack_keys(t["o_doc"].to_numpy(zero_copy_only=False),
                          t["o_line"].to_numpy(zero_copy_only=False))
        w = np.asarray(t["wkey"].to_pylist(), dtype=object)
        m = keys != w
        return pa.table({
            id_col: t["o_doc"].filter(pa.array(m)),
            "drop_line": t["o_line"].filter(pa.array(m)),
        })

    drops = joined.map_batches(to_drops, batch_format="pyarrow")

    def pack_group(g: pd.DataFrame) -> pd.DataFrame:
        # comma-joined string: survives the join as a plain utf8 column
        nos = np.sort(g["drop_line"].to_numpy())
        return pd.DataFrame({
            id_col: [g[id_col].iloc[0]],
            "drop_lines": [",".join(str(int(x)) for x in nos)],
        })

    lists = drops.groupby(id_col).map_groups(pack_group,
                                             batch_format="pandas")
    joined_docs = bucketed_join(ds, lists, on=[id_col], how="left")

    def finish(t: pa.Table) -> pa.Table:
        dl = t["drop_lines"].to_pylist()
        lookup = {int(i): ([int(x) for x in v.split(",")] if v else ())
                  for i, v in zip(t[id_col].to_pylist(), dl)}
        return _rebuild(t, text_col, id_col,
                        lambda d: lookup.get(d, ()))

    return joined_docs.map_batches(finish, batch_format="pyarrow")
