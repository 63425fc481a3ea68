"""SPEC P8 (JSX/TSX) semantic gates — what the lexer+parser must and
must not extract from .tsx/.jsx files. The reference parses these via
ts.createSourceFile with ScriptKind inferred from the extension
(enhanced-ast-parser.ts:53-58); its visitor reacts only to
CallExpression-and-friends, so JSX syntax itself emits nothing."""

import pyarrow as pa

from hikma_engine_ray.golden import parse_file, preprocess
from hikma_engine_ray.schemas import CORPUS
from hikma_engine_ray.stages.file_meta import file_meta_batch
from hikma_engine_ray.stages.parser import ParseFiles, _preprocess_jsx

VIEW = """import { f_0_0 } from './mod_0';

export function View(props) {
  const n = f_0_0(props.a, 2);
  return (
    <div className="view" data-k={n}>
      <span>pseudo_call(n) never counts</span>
      {fmt(n)}
      <Item value={f_0_0(n, 1)} on={() => f_0_0(n, 3)} />
      {props.list.map((x) => (
        <li key={x}>{fmt(x)}</li>
      ))}
      {n > 0 && <em>{props.t}</em>}
      {/* jsx comment fake_call(1) */}
    </div>
  );
}

function fmt(x) {
  return x * 2;
}

const Item = (props) => {
  return <b title="a > b">{props.value}</b>;
};
"""


def _gold(path, src):
    return parse_file("p/q", path, "c1", src)


def test_jsx_calls_only_in_containers():
    ents, triples, mentions, *_ = _gold("src/View.tsx", VIEW)
    names = {(e.kind, e.name) for e in ents}
    assert ("Function", "View") in names
    assert ("Function", "fmt") in names
    assert ("ArrowFunction", "Item") in names
    # JSX tag names and text never become entities or calls
    flat = {n for _, n in names}
    assert not {"div", "span", "li", "em", "pseudo_call", "fake_call"} & flat
    calls = [(s, o) for s, p, o, *_ in triples if p == "CALLS"]
    # View → fmt twice ({fmt(n)} and {fmt(x)} in the map arrow)
    view = next(e for e in ents if e.name == "View")
    fmt = next(e for e in ents if e.name == "fmt")
    assert calls.count((view.eid, fmt.eid)) == 2
    assert len(calls) == 2  # nothing else — tags/text/comments inert
    # three f_0_0 call sites (statement, attribute, inline arrow attr)
    m = [x for x in mentions if x["kind"] == "call"]
    assert [x["symbol"] for x in m] == ["f_0_0", "f_0_0", "f_0_0"]


def test_jsx_comparison_stays_operator():
    src = (
        "function gen(a, b) {\n"
        "  return a < b && b > gen(a, 1);\n"
        "}\n"
    )
    ents, triples, *_ = _gold("src/cmp.tsx", src)
    calls = [(s, o) for s, p, o, *_ in triples if p == "CALLS"]
    assert len(calls) == 1  # the recursive gen(a, 1) survives


def test_jsx_fragment_and_unterminated():
    src = (
        "function f(x) {\n  return x;\n}\n"
        "const F = () => <>{f(1)}<hr/></>;\n"
        "const bad = () => <div unterminated\n"
    )
    ents, triples, *_ = _gold("src/frag.tsx", src)
    # unterminated JSX masks to EOF without crashing; F's container call
    # is on F's decl line → attributed to F (arrow end = decl line)
    f_ent = next(e for e in ents if e.name == "f")
    f_arrow = next(e for e in ents if e.name == "F")
    calls = [(s, o) for s, p, o, *_ in triples if p == "CALLS"]
    assert (f_arrow.eid, f_ent.eid) in calls


def test_plain_ts_keeps_angle_operators():
    # identical text in a .ts file: `<` never opens JSX there
    src = "function lt(a, b) {\n  return a < b;\n}\n"
    scan_ts, _, _ = preprocess(src, jsx=False)
    scan_tsx, _, _ = preprocess(src, jsx=True)
    assert scan_ts == scan_tsx  # identifier before `<` → operator in both


def test_jsx_lexers_agree_and_preserve_lines():
    for impl in (lambda s: preprocess(s, jsx=True), _preprocess_jsx):
        scan, brace, _ = impl(VIEW)
        assert len(scan) == VIEW.count("\n") + 1
        assert [len(l) for l in scan] == [
            len(l) for l in VIEW.split("\n")
        ]
    g = preprocess(VIEW, jsx=True)
    e = _preprocess_jsx(VIEW)
    assert g == e


def test_jsx_engine_matches_golden_on_view():
    t = pa.Table.from_pylist(
        [{"repo": "p/q", "path": "src/View.tsx", "commit": "c1",
          "lang": "typescript", "content": VIEW}],
        schema=CORPUS,
    )
    out = ParseFiles()(file_meta_batch(t)).to_pylist()
    ents, triples, mentions, *_ = _gold("src/View.tsx", VIEW)
    from hikma_engine_ray.ids import repo_id

    rid = repo_id("p/q")
    eng = {
        (r["subj"], r["pred"], r["obj"])
        for r in out
        if r["kind"] == "triple"
        and r["pred"] not in {"MODIFIED_IN", "HAS_COMMIT"}
        and not (r["pred"] == "CONTAINS" and r["subj"] == rid)
    }
    assert eng == {(s, p, o) for s, p, o, *_ in triples}
