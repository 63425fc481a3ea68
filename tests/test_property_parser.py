"""Property-based check: on randomized synthetic source files, the
engine parser's (subj, pred, obj) set equals the golden oracle's —
including files with hostile structure (nesting, unicode, unbalanced
braces, comments containing call-like text)."""

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from hikma_engine_ray.golden import parse_file
from hikma_engine_ray.schemas import CORPUS
from hikma_engine_ray.stages.file_meta import file_meta_batch
from hikma_engine_ray.stages.parser import ParseFiles

_PARSER = ParseFiles()

name = st.from_regex(r"[a-z][a-z0-9_]{0,6}", fullmatch=True)
uname = st.from_regex(r"[a-zéψ][a-z0-9_é]{0,5}", fullmatch=True)


@st.composite
def source_file(draw):
    lines = []
    n_imports = draw(st.integers(0, 3))
    for i in range(n_imports):
        spec = draw(st.sampled_from(["./other", "../lib/utils", "fs", "./missing"]))
        syms = draw(st.lists(name, min_size=1, max_size=3, unique=True))
        if draw(st.booleans()):
            lines.append(f"import {{ {', '.join(syms)} }} from '{spec}';")
        else:  # multi-line import clause (SPEC E7)
            lines.append("import {")
            for s in syms:
                lines.append(f"  {s},")
            lines.append(f"}} from '{spec}';")
    if draw(st.booleans()):  # block comment with hostile text (SPEC P0)
        lines.append("/* block comment { with brace and fake_call(1)")
        lines.append("   spanning lines */")
    n_funcs = draw(st.integers(0, 4))
    fnames = draw(st.lists(uname, min_size=n_funcs, max_size=n_funcs, unique=True))
    for fn in fnames:
        body_calls = draw(st.lists(st.sampled_from(fnames + ["ext", "missing1"]),
                                   max_size=2))
        if draw(st.booleans()):  # JSDoc block (SPEC P7)
            if draw(st.booleans()):
                lines.append(f"/** doc for {fn} with fake_doc_call(9) */")
            else:
                lines.append("/**")
                lines.append(f" * doc for {fn}")
                lines.append(" */")
            if draw(st.booleans()):
                lines.append("")  # attaches through blank lines
        if draw(st.booleans()):
            lines.append(f"@deco{draw(st.integers(0, 3))}")
        lines.append(f"function {fn}(a, b) {{")
        for c in body_calls:
            lines.append(f"  const x = {c}(a);")
        if draw(st.booleans()):
            lines.append("  // comment mentioning call_like(1)")
        if draw(st.booleans()):  # template literal with braces (SPEC P0)
            lines.append("  const t = `tpl { brace ${a} and fakecall(2)`;")
        lines.append("  return a + b;")
        lines.append("}")
    if draw(st.booleans()) and fnames:
        lines.append(f"const arrow1 = (x) => {fnames[0]}(x, 1);")
    if draw(st.booleans()):
        cname = draw(name)
        if draw(st.booleans()):
            lines.append("@Injectable()")
        lines.append(f"class K{cname} {{")
        lines.append("  run(x) {")
        if fnames:
            lines.append(f"    return {fnames[0]}(x);")
        lines.append("  }")
        lines.append("}")
    if draw(st.booleans()) and fnames:
        if draw(st.booleans()):
            lines.append(f"export {{ {fnames[0]} }};")
        else:  # multi-line export list (SPEC E8)
            lines.append("export {")
            lines.append(f"  {fnames[0]},")
            lines.append("};")
    if draw(st.booleans()):
        lines.append(draw(st.sampled_from(
            ["}}{{", "((", "] ]", "const broken =",
             "/* unterminated block", "const s = 'unterminated",
             "const q = `unterminated template"])))
    return "\n".join(lines) + "\n"


@settings(max_examples=60, deadline=None)
@given(source_file())
def test_engine_matches_golden_per_file(src):
    repo, path, commit = "p/q", "src/gen.ts", "c1"
    gold_ents, gold_triples, gold_mentions, _, _ = parse_file(repo, path, commit, src)
    gold_spo = {(t[0], t[1], t[2]) for t in gold_triples}
    gold_m = {
        (m["module"], m["symbol"], m["kind"], m["src_id"]) for m in gold_mentions
    }

    t = pa.Table.from_pylist(
        [{"repo": repo, "path": path, "commit": commit, "lang": "typescript",
          "content": src}],
        schema=CORPUS,
    )
    out = _PARSER(file_meta_batch(t)).to_pylist()
    # engine emits file-level rows golden's parse_file doesn't; compare
    # entity-level triples and mentions only (repo→file CONTAINS is
    # file-level; class→method CONTAINS is entity-level and must match)
    from hikma_engine_ray.ids import repo_id

    rid = repo_id(repo)
    eng_spo = {
        (r["subj"], r["pred"], r["obj"])
        for r in out
        if r["kind"] == "triple"
        and r["pred"] not in {"MODIFIED_IN", "HAS_COMMIT"}
        and not (r["pred"] == "CONTAINS" and r["subj"] == rid)
    }
    eng_m = {
        (r["module"], r["symbol"], r["mkind"], r["src_id"])
        for r in out
        if r["kind"] == "mention" and r["mkind"] != "import"
    }
    gold_m_nonimport = {m for m in gold_m if m[2] != "import"}
    assert eng_spo == gold_spo, (eng_spo ^ gold_spo, src)
    assert eng_m == gold_m_nonimport, (eng_m ^ gold_m_nonimport, src)

    # SPEC P7 parity: per-entity docstring props must agree
    import json

    gold_docs = {
        (e.kind, e.name): e.props.get("docstring") for e in gold_ents
    }
    eng_docs = {
        (r["node_type"], r["name"]): json.loads(r["props_json"] or "{}").get("docstring")
        for r in out
        if r["kind"] == "node" and r["node_type"] in gold_docs_kinds
    }
    for key, want in gold_docs.items():
        if key[0] in gold_docs_kinds:
            assert eng_docs.get(key) == want, (key, want, eng_docs.get(key), src)


gold_docs_kinds = frozenset(
    ["Function", "ArrowFunction", "Method", "TestCase", "Class",
     "Interface", "Variable"]
)


@st.composite
def tsx_source_file(draw):
    """Randomized .tsx component files (SPEC P8): JSX tags/text/attr
    strings must be inert, expression containers live, `<` comparisons
    untouched, nesting arbitrary."""
    lines = []
    fnames = draw(st.lists(name, min_size=1, max_size=3, unique=True))
    for fn in fnames:
        lines.append(f"function {fn}(x) {{")
        lines.append("  return x + 1;")
        lines.append("}")
    comp = draw(name)
    callee = draw(st.sampled_from(fnames))
    lines.append(f"export function C{comp}(props) {{")
    if draw(st.booleans()):  # a `<` comparison before any JSX
        lines.append(f"  const ok = props.a < props.b && {callee}(props.a);")
    lines.append("  return (")
    attr = draw(st.sampled_from(
        ['className="x"', 'title="a > b < c"', f"data-k={{{callee}(1)}}",
         f"on={{() => {callee}(2)}}", ""]))
    tag = draw(st.sampled_from(["div", "Widget", "ns_tag"]))
    lines.append(f"    <{tag} {attr}>")
    body = draw(st.sampled_from([
        f"      fake_{comp}(9) plain text",
        f"      {{{callee}(3)}}",
        f"      {{props.xs.map((v) => <li key={{v}}>{{{callee}(v)}}</li>)}}",
        f"      {{props.n > 0 && <em>{{{callee}(4)}}</em>}}",
        f"      {{/* comment_call(5) */}}",
        f"      <Inner a={{{{k: 1}}}} />",
        "      <>{props.t}</>",
    ]))
    lines.append(body)
    lines.append(f"    </{tag}>")
    lines.append("  );")
    lines.append("}")
    if draw(st.booleans()):  # self-closing component after the return
        lines.append(f"const tiny{comp} = () => <hr data-q={{{callee}(6)}} />;")
    if draw(st.booleans()):  # hostile tail
        lines.append(draw(st.sampled_from(
            ["const bad = () => <div unterminated",
             "}}{{",
             f"const cmp = (a, b) => a < b;",
             "/* unterminated block"])))
    return "\n".join(lines) + "\n"


@settings(max_examples=60, deadline=None)
@given(tsx_source_file())
def test_engine_matches_golden_tsx(src):
    """SPEC P8: engine ≡ golden on randomized JSX files."""
    repo, path, commit = "p/q", "src/gen.tsx", "c1"
    gold_ents, gold_triples, gold_mentions, _, _ = parse_file(repo, path, commit, src)
    gold_spo = {(t[0], t[1], t[2]) for t in gold_triples}
    gold_m = {
        (m["module"], m["symbol"], m["kind"], m["src_id"])
        for m in gold_mentions
        if m["kind"] != "import"
    }
    t = pa.Table.from_pylist(
        [{"repo": repo, "path": path, "commit": commit, "lang": "typescript",
          "content": src}],
        schema=CORPUS,
    )
    out = _PARSER(file_meta_batch(t)).to_pylist()
    from hikma_engine_ray.ids import repo_id

    rid = repo_id(repo)
    eng_spo = {
        (r["subj"], r["pred"], r["obj"])
        for r in out
        if r["kind"] == "triple"
        and r["pred"] not in {"MODIFIED_IN", "HAS_COMMIT"}
        and not (r["pred"] == "CONTAINS" and r["subj"] == rid)
    }
    eng_m = {
        (r["module"], r["symbol"], r["mkind"], r["src_id"])
        for r in out
        if r["kind"] == "mention" and r["mkind"] != "import"
    }
    assert eng_spo == gold_spo, (eng_spo ^ gold_spo, src)
    assert eng_m == gold_m, (eng_m ^ gold_m, src)
