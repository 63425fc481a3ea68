"""Exact n-gram-Jaccard set-similarity SELF-JOIN via prefix filtering
(public algorithm: Bayardo, Ma, Srikant — "Scaling Up All Pairs
Similarity Search", WWW 2007). Unlike the minhash/simhash LSH family
in ``dedup_suite.py`` (probabilistic candidate generation), this join
is EXACT: every pair with shingle-Jaccard >= threshold surfaces.

The reference engine has no similarity join at all — this belongs to
the training-data-pipeline suite the Ray port adds as first-class
(same family as dedup_suite.py; shares its shingle kernel so the
"similar" relation is identical across exact and approximate paths).

Scale shape (one shuffle + the verify join; no all-pairs anywhere):

  docs --map_batches--> prefix rows (g = u64 shingle hash, doc_id, n)
       --hash-bucket groupby(g)--> candidate pairs, size-ratio filtered
       --dedup_exact(a, b)--> distinct candidates
       --verify_jaccard_joined--> exact (a, b, jaccard >= t)

Prefix-filter lemma (the pruning guarantee): order the shingle
universe by a fixed total order (here: a 64-bit stable hash). If
J(A, B) >= t then |A ∩ B| >= ceil(t·|A|), so B must contain one of
the first |A| - ceil(t·|A|) + 1 elements of A in that order — and
symmetrically — hence the two PREFIXES intersect and the pair lands
in some shingle group. Every non-surfaced pair is a true negative.
At t = 0.8 each doc ships ~20% of its shingles into the shuffle.

Partitioning assumptions, documented per the north rule:
  * Collision groups are per PREFIX-shingle. Exact-duplicate floods
    (g identical docs) genuinely have g²/2 qualifying pairs — an
    exact join's OUTPUT is O(g²) there by definition; run
    ``exact_dedup`` first if that flood is unwanted. Pair expansion
    itself is vectorized (np.triu_indices), never per-pair Python.
  * Shingles are compared through 64-bit hashes; a cross-doc hash
    collision can only ADD a candidate (verified away later), and a
    within-doc collision shortens one prefix by one slot — with
    blake2b-64 over per-doc shingle sets (thousands of elements) the
    probability is negligible; this is the standard trick in
    published all-pairs systems.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import BUCKET_COL, add_bucket_column, blocks_for_keys, dedup_exact
from .dedup_suite import (
    _hash_occurrences,
    _shingles,
    verify_jaccard_joined,
)

_PREFIX_SEED = 11  # fixed: the shingle total order must be global

_PREFIX_SCHEMA = pa.schema(
    [("g", pa.uint64()), ("doc_id", pa.int64()), ("n", pa.int32())]
)


def prefix_rows(threshold: float, k: int = 5, text_col: str = "text",
                id_col: str = "doc_id"):
    """map_batches fn: docs -> one row per PREFIX shingle
    ``(g, doc_id, n)`` where n = |shingle set| (the size-ratio filter
    input). Shingle-less docs emit nothing (the same empty-doc
    short-circuit as the LSH stages — content-less rows belong to
    exact dedup, and J(∅, ∅) pairs would otherwise flood one group)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        all_sh: list[bytes] = []
        lens = np.empty(len(texts), dtype=np.int64)
        for j, t in enumerate(texts):
            sh = _shingles(t or "", k)
            lens[j] = len(sh)
            all_sh.extend(sh)
        h = _hash_occurrences(all_sh, _PREFIX_SEED)
        doc_idx = np.repeat(np.arange(len(texts)), lens)
        # sort each doc's hashes ascending (one global lexsort — no
        # per-doc Python); _shingles returns a SET so values are
        # already unique within a doc (modulo 64-bit collisions)
        order = np.lexsort((h, doc_idx))
        h, doc_idx = h[order], doc_idx[order]
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        rank = np.arange(len(h)) - np.repeat(starts, lens)
        # prefix length p = n - ceil(t*n) + 1  (lemma above)
        p = lens - np.ceil(threshold * lens).astype(np.int64) + 1
        keep = rank < np.repeat(p, lens)
        return pa.Table.from_arrays(
            [
                pa.array(h[keep], pa.uint64()),
                pa.array(ids[doc_idx[keep]], pa.int64()),
                pa.array(lens[doc_idx[keep]].astype(np.int32), pa.int32()),
            ],
            schema=_PREFIX_SCHEMA,
        )

    return fn


def _pairs_from_groups(threshold: float):
    """Per-bucket kernel: expand each shingle group's candidate pairs
    (vectorized triu), keeping only size-compatible pairs — J >= t
    forces min(n_a, n_b) >= t · max(n_a, n_b)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.duplicated(subset=["g"], keep=False)]
        parts_a: list[np.ndarray] = []
        parts_b: list[np.ndarray] = []
        for _, sub in g.groupby("g", sort=False):
            sub = sub.drop_duplicates(subset=["doc_id"])
            if len(sub) < 2:
                continue
            ids = sub["doc_id"].to_numpy(dtype=np.int64)
            ns = sub["n"].to_numpy(dtype=np.int64)
            o = np.argsort(ids, kind="stable")
            ids, ns = ids[o], ns[o]
            ia, ib = np.triu_indices(len(ids), k=1)
            ok = np.minimum(ns[ia], ns[ib]) >= threshold * np.maximum(
                ns[ia], ns[ib]
            )
            parts_a.append(ids[ia[ok]])
            parts_b.append(ids[ib[ok]])
        a = np.concatenate(parts_a) if parts_a else np.empty(0, np.int64)
        b = np.concatenate(parts_b) if parts_b else np.empty(0, np.int64)
        return pd.DataFrame({"a": pd.Series(a, dtype="int64"),
                             "b": pd.Series(b, dtype="int64")})

    return fn


def jaccard_self_join(docs_ds, threshold: float = 0.8, k: int = 5,
                      text_col: str = "text", id_col: str = "doc_id",
                      nbuckets: int = 32):
    """Exact all-pairs (a < b, jaccard >= threshold) over a document
    dataset. Returns Dataset[(a: i64, b: i64, jaccard: f64)]."""
    assert 0.0 < threshold <= 1.0
    pref = docs_ds.map_batches(
        prefix_rows(threshold, k, text_col, id_col), batch_format="pyarrow"
    )
    cand = (
        pref.map_batches(add_bucket_column(["g"], nbuckets), batch_format="pyarrow")
        .repartition(blocks_for_keys(nbuckets))
        .groupby(BUCKET_COL)
        .map_groups(
            lambda g: _pairs_from_groups(threshold)(g.drop(columns=[BUCKET_COL])),
            batch_format="pandas",
        )
    )
    cand = dedup_exact(cand, key_cols=["a", "b"], sort_cols=["a", "b"])
    return verify_jaccard_joined(
        cand, docs_ds, threshold, k=k, text_col=text_col, id_col=id_col,
        nbuckets=nbuckets,
    )


# g as an int64 BIT-VIEW of the u64 shingle hash: Ray's sort shuffle
# pickles uint64 KEY columns into extension-object blocks (NOTES.md,
# found in the substr stage) — the containment path groupbys/joins on
# g directly, so it must be int64 on the wire. Any fixed total order
# works for the prefix lemma; the signed view is one.
_GRAM_SCHEMA = pa.schema(
    [("g", pa.int64()), ("doc_id", pa.int64()), ("n", pa.int32())]
)


def _all_gram_rows(k: int, text_col: str, id_col: str):
    """map_batches fn: docs → one row per DISTINCT shingle
    ``(g, doc_id, n)`` (the containment join's index side — every
    shingle, not just a prefix)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        all_sh: list[bytes] = []
        lens = np.empty(len(texts), dtype=np.int64)
        for j, t in enumerate(texts):
            sh = _shingles(t or "", k)
            lens[j] = len(sh)
            all_sh.extend(sh)
        h = _hash_occurrences(all_sh, _PREFIX_SEED).view(np.int64)
        doc_idx = np.repeat(np.arange(len(texts)), lens)
        return pa.Table.from_arrays(
            [pa.array(h, pa.int64()),
             pa.array(ids[doc_idx], pa.int64()),
             pa.array(lens[doc_idx].astype(np.int32), pa.int32())],
            schema=_GRAM_SCHEMA,
        )

    return fn


def containment_self_join(docs_ds, threshold: float = 0.8, k: int = 5,
                          text_col: str = "text", id_col: str = "doc_id",
                          nbuckets: int = 32,
                          freq_driver_limit: int = 5_000_000,
                          pair_driver_limit: int = 100_000,
                          rows_driver_limit: int = 2_000_000):
    """Exact CONTAINMENT self-join: directed pairs (a, b), a ≠ b, with
    |S_a ∩ S_b| / |S_a| ≥ threshold — the asymmetric near-dup relation
    Jaccard misses (an excerpt inside a much larger doc has tiny
    Jaccard but containment ≈ 1). Returns
    Dataset[(a: i64, b: i64, containment: f64)].

    Prefix lemma (containment form): if |A∩B| ≥ t·|A| then B contains
    one of A's first |A| − ⌈t·|A|⌉ + 1 shingles in ANY fixed total
    order of the shingle universe. Unlike the Jaccard join there is no
    symmetric pruning — the index side must post ALL its shingles — so
    the order matters enormously: this implementation orders by GLOBAL
    FREQUENCY (rarest first, hash tiebreak), the standard trick from
    the all-pairs literature, which makes every candidate group's
    index list exactly the posting list of a RARE shingle. Hot
    boilerplate shingles never appear in any prefix and never form a
    group.

    Shape (gram rows = distinct (doc, shingle) pairs — the same volume
    dup_ngram_cov shuffles):
      1. gram rows + a (g, freq) count aggregate       [1 shuffle]
      2. freq joined back, per-doc rarest-first prefix  [2 shuffles]
      3. prefix ∪ index rows grouped by g → candidates  [1 shuffle]
      4. joined exact verify on |S_a ∩ S_b| / |S_a|     [2 joins]
    Documented assumption: a rare shingle's posting list fits a reduce
    block (true by construction of "rare"; an all-boilerplate corpus
    degrades to per-gram lists the size of the boilerplate family —
    run exact_dedup first, as with the Jaccard join)."""
    from ray.data.aggregate import Sum

    from .joins import bucketed_join

    assert 0.0 < threshold <= 1.0
    rows = docs_ds.map_batches(
        _all_gram_rows(k, text_col, id_col), batch_format="pyarrow"
    ).materialize()  # reused: freq pass + prefix pass + index side

    # count-guarded driver fast path (repo convention — cf. PageRank /
    # BFS / triangles): the gram-row table is 20 B/row, so below the
    # guard the WHOLE candidate generation is one in-process
    # numpy/pandas pass instead of 4+ sort-shuffle executions whose
    # fixed cost dwarfs 5 MB of data. The distributed path below is
    # the 100 TB shape and stays equivalence-tested.
    if rows.count() <= rows_driver_limit:
        return _containment_driver(rows, docs_ds, threshold, k,
                                   text_col, id_col)

    def freq_partial(t: pa.Table) -> pa.Table:
        g = t.select(["g"]).group_by(["g"]).aggregate([("g", "count")])
        return g.rename_columns(["g", "f"])

    freq = (
        rows.map_batches(freq_partial, batch_format="pyarrow")
        .groupby("g").aggregate(Sum("f", alias_name="f"))
        .materialize()
    )

    # per-doc rarest-first prefix: p = n - ceil(t*n) + 1 rows with the
    # smallest (f, g)
    def prefix_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "f", "g"], kind="stable")
        pos = g.groupby("doc_id", sort=False).cumcount().to_numpy()
        n = g["n"].to_numpy(dtype=np.int64)
        p = n - np.ceil(threshold * n).astype(np.int64) + 1
        return g[pos < p]

    n_grams = freq.count()
    if n_grams <= freq_driver_limit:
        # broadcast the (g, f) table: a gram-row block holds whole
        # docs (emitted per input batch), so the rarest-first prefix
        # is a PURE MAP — no join, no doc-bucket shuffle
        import ray

        from .dedup import collect_arrow

        ft = collect_arrow(freq)
        gs = ft["g"].to_numpy(zero_copy_only=False)
        fs = ft["f"].to_numpy(zero_copy_only=False)
        order = np.argsort(gs)
        fref = ray.put((gs[order], fs[order]))

        def prefix_map(t: pa.Table) -> pa.Table:
            g_s, f_s = ray.get(fref)
            gh = t["g"].to_numpy(zero_copy_only=False)
            f = f_s[np.searchsorted(g_s, gh)]
            df = pd.DataFrame({
                "g": gh,
                "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
                "n": t["n"].to_numpy(zero_copy_only=False),
                "f": f,
            })
            out = prefix_per_bucket(df)[["g", "doc_id", "n"]]
            return pa.Table.from_pandas(out, preserve_index=False)

        qpref = rows.map_batches(prefix_map, batch_format="pyarrow")
    else:
        rows_f = bucketed_join(rows, freq, on=["g"], nbuckets=nbuckets)
        qpref = (
            rows_f.map_batches(add_bucket_column(["doc_id"], nbuckets),
                               batch_format="pyarrow")
            .repartition(blocks_for_keys(nbuckets))
            .groupby(BUCKET_COL)
            .map_groups(
                lambda g: prefix_per_bucket(g.drop(columns=[BUCKET_COL]))
                [["g", "doc_id", "n"]],
                batch_format="pandas",
            )
        )

    def tag(role: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "role", pa.array(np.full(t.num_rows, role, np.int8), pa.int8())
            )

        return fn

    tagged = qpref.map_batches(tag(0), batch_format="pyarrow").union(
        rows.map_batches(tag(1), batch_format="pyarrow")
    )

    def pairs_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        parts_a, parts_b = [], []
        for _, sub in g.groupby("g", sort=False):
            q = sub[sub["role"] == 0]
            i = sub[sub["role"] == 1]
            if not len(q) or len(i) < 2:
                continue
            qa = q["doc_id"].to_numpy(dtype=np.int64)
            qn = q["n"].to_numpy(dtype=np.int64)
            ia = i["doc_id"].to_numpy(dtype=np.int64)
            inn = i["n"].to_numpy(dtype=np.int64)
            A = np.repeat(qa, len(ia)); An = np.repeat(qn, len(ia))
            B = np.tile(ia, len(qa)); Bn = np.tile(inn, len(qa))
            # |B| >= |A∩B| >= t|A| prune + no self-pairs
            ok = (A != B) & (Bn >= np.ceil(threshold * An).astype(np.int64))
            parts_a.append(A[ok]); parts_b.append(B[ok])
        a = np.concatenate(parts_a) if parts_a else np.empty(0, np.int64)
        b = np.concatenate(parts_b) if parts_b else np.empty(0, np.int64)
        return pd.DataFrame({"a": pd.Series(a, dtype="int64"),
                             "b": pd.Series(b, dtype="int64")})

    cand = (
        tagged.map_batches(add_bucket_column(["g"], nbuckets),
                           batch_format="pyarrow")
        .repartition(blocks_for_keys(nbuckets))
        .groupby(BUCKET_COL)
        .map_groups(
            lambda g: pairs_per_bucket(g.drop(columns=[BUCKET_COL])),
            batch_format="pandas",
        )
    )
    cand = dedup_exact(cand, key_cols=["a", "b"],
                       sort_cols=["a", "b"]).materialize()
    if cand.count() <= pair_driver_limit:
        return _verify_containment_driver(
            cand, docs_ds, threshold, k=k, text_col=text_col,
            id_col=id_col)
    return verify_containment_joined(
        cand, docs_ds, threshold, k=k, text_col=text_col, id_col=id_col,
        nbuckets=nbuckets,
    )


def _containment_driver(rows, docs_ds, threshold: float, k: int,
                        text_col: str, id_col: str):
    """In-process candidate generation + verify for gram tables under
    the count guard: identical semantics to the distributed path
    (rarest-first prefix, |B| size prune, exact verify), pure pandas/
    numpy."""
    import ray.data as rd

    from .dedup import collect_arrow

    rt = collect_arrow(rows)
    df = pd.DataFrame({
        "g": rt["g"].to_numpy(zero_copy_only=False),
        "doc_id": rt["doc_id"].to_numpy(zero_copy_only=False),
        "n": rt["n"].to_numpy(zero_copy_only=False).astype(np.int64),
    })
    if not len(df):
        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "containment": pa.array([], pa.float64())}))
    gs, inv, counts = np.unique(df["g"].to_numpy(), return_inverse=True,
                                return_counts=True)
    df["f"] = counts[inv]
    df = df.sort_values(["doc_id", "f", "g"], kind="stable")
    pos = df.groupby("doc_id", sort=False).cumcount().to_numpy()
    n = df["n"].to_numpy()
    pref = df[pos < n - np.ceil(threshold * n).astype(np.int64) + 1]
    cand = pref.merge(df[["g", "doc_id", "n"]], on="g",
                      suffixes=("_a", "_b"))
    a = cand["doc_id_a"].to_numpy(np.int64)
    b = cand["doc_id_b"].to_numpy(np.int64)
    na = cand["n_a"].to_numpy(np.int64)
    nb_ = cand["n_b"].to_numpy(np.int64)
    ok = (a != b) & (nb_ >= np.ceil(threshold * na).astype(np.int64))
    pairs = pd.DataFrame({"a": a[ok], "b": b[ok]}).drop_duplicates()
    ct = pa.table({"a": pa.array(pairs["a"].to_numpy(np.int64), pa.int64()),
                   "b": pa.array(pairs["b"].to_numpy(np.int64), pa.int64())})
    return _verify_containment_driver(rd.from_arrow(ct), docs_ds,
                                      threshold, k=k, text_col=text_col,
                                      id_col=id_col)


def _verify_containment_driver(cand, docs_ds, threshold: float, k: int,
                               text_col: str, id_col: str):
    """Result-sized verify: the candidate pair set is small, so fetch
    ONLY the involved docs (broadcast id filter — one streaming pass,
    no join) and score the pairs on the driver. The joined fallback
    above handles candidate sets past the guard."""
    import ray
    import ray.data as rd

    from .dedup import collect_arrow

    ct = collect_arrow(cand)
    a = ct["a"].to_numpy(zero_copy_only=False)
    b = ct["b"].to_numpy(zero_copy_only=False)
    if len(a) == 0:
        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "containment": pa.array([], pa.float64())}))
    involved = np.unique(np.concatenate([a, b]))
    iref = ray.put(involved)

    def pick(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        inv = ray.get(iref)
        pos = np.searchsorted(inv, ids)
        pos[pos >= len(inv)] = 0
        m = inv[pos] == ids
        return pa.table({id_col: t[id_col].filter(pa.array(m)),
                         text_col: t[text_col].filter(pa.array(m))})

    dt = collect_arrow(docs_ds.map_batches(pick, batch_format="pyarrow"))
    texts = dict(zip(dt[id_col].to_pylist(), dt[text_col].to_pylist()))
    sets = {i: _shingles(texts.get(i) or "", k) for i in involved.tolist()}
    cont = np.array([
        (len(sets[x] & sets[y]) / len(sets[x]) if sets[x] else 0.0)
        for x, y in zip(a.tolist(), b.tolist())
    ], dtype=np.float64)
    keep = cont >= threshold
    return rd.from_arrow(pa.table({
        "a": pa.array(a[keep], pa.int64()),
        "b": pa.array(b[keep], pa.int64()),
        "containment": pa.array(cont[keep], pa.float64()),
    }))


def verify_containment_joined(pairs_ds, docs_ds, threshold: float,
                              k: int = 5, text_col: str = "text",
                              id_col: str = "doc_id", nbuckets: int = 32):
    """Exact containment verification via two bucketed joins of the
    (candidate-sized) pair set against the documents — the same
    no-materialization shape as verify_jaccard_joined."""
    from .joins import bucketed_join

    docs_a = docs_ds.map_batches(
        lambda t: pa.table({"a": t[id_col], "text_a": t[text_col]}),
        batch_format="pyarrow",
    )
    docs_b = docs_ds.map_batches(
        lambda t: pa.table({"b": t[id_col], "text_b": t[text_col]}),
        batch_format="pyarrow",
    )
    pairs_ds = pairs_ds.materialize()
    joined = bucketed_join(pairs_ds, docs_a, on=["a"],
                           nbuckets=nbuckets).materialize()
    joined = bucketed_join(joined, docs_b, on=["b"], nbuckets=nbuckets)

    def verify(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        ta = batch["text_a"].to_pylist()
        tb = batch["text_b"].to_pylist()
        cache: dict[int, set] = {}

        def sh(did, text):
            s = cache.get(did)
            if s is None:
                s = cache[did] = _shingles(text or "", k)
            return s

        cont = [
            (len(sh(x, tx) & sh(y, ty)) / len(sh(x, tx))
             if sh(x, tx) else 0.0)
            for x, y, tx, ty in zip(a, b, ta, tb)
        ]
        keep = [c >= threshold for c in cont]
        t = pa.Table.from_arrays(
            [pa.array(a, pa.int64()), pa.array(b, pa.int64()),
             pa.array(cont, pa.float64())],
            names=["a", "b", "containment"],
        )
        return t.filter(pa.array(keep))

    return joined.map_batches(verify, batch_format="pyarrow")
