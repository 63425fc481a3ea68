"""Property: the vectorized bucket resolver produces exactly the rows
of per-link_key ``link_group`` — including dangling reasons — on
randomized mention/definition mixes."""

import random

import pandas as pd
import pyarrow as pa

from hikma_engine_ray.stages.linking import LINKED_SCHEMA, link_bucket, link_group


def _mk_rows(seed: int):
    rng = random.Random(seed)
    rows = []
    keys = [f"r{i}\x1fsrc/m{i}\x1f0" for i in range(6)]
    for i, key in enumerate(keys):
        has_file = rng.random() < 0.8
        if has_file:
            for commit in (["c1", "c2"] if rng.random() < 0.3 else ["c1"]):
                rows.append(
                    dict(link_key=key, side="d", cand_priority=rng.choice([0, 1]),
                         repo=f"r{i}", module=f"src/m{i}.ts", symbol="",
                         mkind="", src_id="", src_kind="", def_kind="File",
                         commit=commit, obj=f"fid{i}{commit}", line=0, col=0)
                )
            for s in ["foo", "bar"]:
                if rng.random() < 0.7:
                    rows.append(
                        dict(link_key=key, side="d", cand_priority=1,
                             repo=f"r{i}", module=f"src/m{i}.ts", symbol=s,
                             mkind="", src_id="", src_kind="",
                             def_kind=rng.choice(["Function", "Class"]),
                             commit="c1", obj=f"eid-{i}-{s}", line=0, col=0)
                    )
        for j in range(rng.randrange(4)):
            rows.append(
                dict(link_key=key, side="m", cand_priority=0, repo=f"r{i}",
                     module=f"./m{i}", symbol=rng.choice(["foo", "bar", "baz", ""]),
                     mkind=rng.choice(["call", "extends", "implements", "import"]),
                     src_id=f"src-{i}-{j}",
                     src_kind=rng.choice(["Function", "TestCase", "Class", "File"]),
                     def_kind="", commit="", obj="", line=j + 1, col=j)
            )
    return pd.DataFrame(rows)


def _norm(t: pa.Table) -> set:
    return {tuple(str(v) for v in row.values()) for row in t.to_pylist()}


def test_vectorized_matches_per_group():
    for seed in range(20):
        df = _mk_rows(seed)
        if df.empty:
            continue
        vec = link_bucket(df)
        per = []
        for _, sub in df.groupby("link_key", sort=True):
            r = link_group(sub)
            if r.num_rows:
                per.append(r)
        per_t = pa.concat_tables(per) if per else LINKED_SCHEMA.empty_table()
        assert _norm(vec) == _norm(per_t), seed


def test_no_duplicate_triples_with_salted_repeat_callsites(ray_session):
    """The global dedup shuffle now skips non-IMPORTS linked triples;
    this holds only because the salt excludes line/col, so repeated call
    sites (same src entity, same callee, different lines) land in one
    link group and dedup there. Pin it: a hot salted key with repeated
    cross-file call sites must yield exactly one CALLS triple per
    (caller, callee) and no duplicate rows anywhere."""
    import pyarrow as pa
    import ray.data as rd

    from hikma_engine_ray.pipelines.index_pipeline import build_graph
    from hikma_engine_ray.schemas import CORPUS

    rows = [
        {
            "repo": "r/r", "path": "src/lib/hot.ts", "commit": "c1",
            "lang": "typescript",
            "content": "export function hotfn(x) {\n  return x;\n}\n",
        }
    ]
    # many callers; each calls hotfn at THREE separate sites
    for i in range(30):
        body = (
            "import { hotfn } from '../lib/hot';\n"
            f"function caller_{i}(a) {{\n"
            "  const x = hotfn(a);\n"
            "  const y = hotfn(x);\n"
            "  return hotfn(y);\n"
            "}\n"
        )
        rows.append({"repo": "r/r", "path": f"src/pkg/m{i}.ts", "commit": "c1",
                     "lang": "typescript", "content": body})
    corpus = pa.Table.from_pylist(rows, schema=CORPUS)
    # hot_threshold=10 → the hot.ts base is salted; nsalt=4
    g = build_graph(rd.from_arrow(corpus), nsalt=4, hot_threshold=10,
                    adjacency=False, embed=False)
    trip = [(r["subj"], r["pred"], r["obj"]) for r in g["triples"].take_all()]
    assert len(trip) == len(set(trip)), "duplicate triple rows emitted"
    calls = [t for t in trip if t[1] == "CALLS"]
    assert len(calls) == 30  # one per caller despite 3 sites each


def test_mention_key_semijoin_equivalence(ray_session):
    """Filtering the def side to mention-referenced keys changes no
    linked triple and no dangling row: unmentioned definitions join
    nothing in link_bucket (both merges are mention-driven)."""
    import ray.data as rd

    from hikma_engine_ray.pipelines.index_pipeline import (
        build_graph_from_tagged, parse_corpus)
    from hikma_engine_ray.sources.corpus import generate_corpus

    tagged = parse_corpus(rd.from_arrow(generate_corpus(120)))

    def _sets(mention_filter: bool):
        import hikma_engine_ray.pipelines.index_pipeline as ip

        orig_limit = ip.MENTION_FILTER_LIMIT
        if not mention_filter:
            ip.MENTION_FILTER_LIMIT = 0  # force the count-guard fallback
        try:
            g = build_graph_from_tagged(
                tagged, embed=False, adjacency=False)
            trip = {(r["subj"], r["pred"], r["obj"])
                    for r in g["triples"].take_all()}
            dang = {(r["repo"], r["module"], r["symbol"], r["reason"],
                     r["src_id"], r["line"], r["col"])
                    for r in g["dangling"].take_all()}
            return trip, dang
        finally:
            ip.MENTION_FILTER_LIMIT = orig_limit

    t_filt, d_filt = _sets(True)
    t_all, d_all = _sets(False)
    assert t_filt == t_all
    assert d_filt == d_all
