"""SPEC v3 (READS/WRITES variable-access edges + CALLS `dynamic`):
deterministic rule checks plus hypothesis equivalence of the golden
char-peek classifier and the engine regex classifier.

Reference rules: enhanced-ast-parser.ts:558-628 (processFunctionBody /
processVariableAccess), :676-691 (isWriteAccess — plain `=` and ++/--
only), :663-669 (isDynamicCall = require/import callee)."""

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from hikma_engine_ray.functions.rules import RW_KEYWORDS
from hikma_engine_ray.golden import IDENT_RE, _classify_access, parse_file
from hikma_engine_ray.ids import entity_id, file_id
from hikma_engine_ray.schemas import CORPUS
from hikma_engine_ray.stages.file_meta import file_meta_batch
from hikma_engine_ray.stages.parser import ParseFiles

_PARSER = ParseFiles()

REPO, PATH, COMMIT = "o/r", "src/m.ts", "c1"
FID = file_id(REPO, COMMIT, PATH)


def _gold_rw(src):
    _, triples, _, _, _ = parse_file(REPO, PATH, COMMIT, src)
    return {(t[0], t[1], t[2]) for t in triples if t[1] in ("READS", "WRITES")}


def _rw_by_key(src):
    """{ '{name}#{line}': set of access types } from the golden."""
    out = {}
    for s, p, o in _gold_rw(src):
        out.setdefault(o.split("#", 1)[1], set()).add(p)
    return out


def test_write_classification_rules():
    src = (
        "function f(a) {\n"       # 1
        "  let n = 0;\n"          # 2  decl initializer → READ
        "  n = a;\n"              # 3  plain assignment → WRITE
        "  n += 1;\n"             # 4  compound → READ (reference quirk)
        "  n++;\n"                # 5  postfix → WRITE
        "  --n;\n"                # 6  prefix → WRITE
        "  o.p = n;\n"            # 7  o READ, p READ ('.'), n READ
        "  const t: Ty = n;\n"    # 8  Ty READ (':' position)
        "  if (n === a) { n = 1; }\n"  # 9  '===' → READ; then WRITE
        "  return n <= a;\n"      # 10 '<=' → READ
        "}\n"
    )
    rw = _rw_by_key(src)
    assert rw["n#2"] == {"READS"}
    assert rw["n#3"] == {"WRITES"}
    assert rw["a#3"] == {"READS"}
    assert rw["n#4"] == {"READS"}
    assert rw["n#5"] == {"WRITES"}
    assert rw["n#6"] == {"WRITES"}
    assert rw["o#7"] == {"READS"}
    assert rw["p#7"] == {"READS"}
    assert rw["Ty#8"] == {"READS"}
    assert rw["t#8"] == {"READS"}
    # line 9 has both an === compare (READ) and an assignment (WRITE)
    assert rw["n#9"] == {"READS", "WRITES"}
    assert rw["n#10"] == {"READS"}
    # keywords never emit accesses
    assert not any(k.startswith(("if#", "return#", "let#", "const#")) for k in rw)


def test_decl_line_scope_and_arrow_body():
    src = (
        "function g(p, q) { return p; }\n"  # params excluded, p in body READ
        "const h = (x) => x + w;\n"         # arrow: body after '=>'
    )
    rw = _rw_by_key(src)
    assert rw.get("p#1") == {"READS"}
    assert "q#1" not in rw  # parameter, not in the body
    assert rw.get("x#2") == {"READS"}  # body occurrence after '=>'
    assert rw.get("w#2") == {"READS"}
    assert "h#2" not in rw  # declaration name, before '=>'


def test_reads_target_is_placeholder_key():
    src = "function f() { return alpha; }\n"
    triples = _gold_rw(src)
    assert (entity_id(FID, "Function", "f", 1, 0), "READS",
            f"{FID}#alpha#1") in triples


def test_engine_emits_dynamic_flag():
    src = (
        "function require(p) { return p; }\n"
        "function f(a) {\n"
        "  require(a);\n"
        "  f(a);\n"
        "}\n"
    )
    t = pa.Table.from_pylist(
        [{"repo": REPO, "path": PATH, "commit": COMMIT,
          "lang": "typescript", "content": src}],
        schema=CORPUS,
    )
    rows = _PARSER(file_meta_batch(t)).to_pylist()
    calls = {(r["obj"], r["dynamic"]) for r in rows
             if r["kind"] == "triple" and r["pred"] == "CALLS"}
    req = entity_id(FID, "Function", "require", 1, 0)
    fn = entity_id(FID, "Function", "f", 2, 0)
    assert (req, True) in calls   # callee named require → dynamic
    assert (fn, False) in calls   # ordinary recursion → not dynamic
    # non-CALLS triples carry null dynamic
    for r in rows:
        if r["kind"] == "triple" and r["pred"] != "CALLS":
            assert r["dynamic"] is None, r


# ---- hypothesis: classifier equivalence on hostile single lines

_tok = st.sampled_from(["x", "yy", "_a", "$b", "n2"])
_ctx = st.sampled_from(
    ["", " ", "  ", "++", "--", "+", "-", "=", "==", "===", "=>", "<=",
     ">=", "!=", ".", ":", ",", "(", ")", "const ", "let ", "var ",
     "aconst ", "= ", "++ ", "obj.", "a: ", "\t"]
)


@settings(max_examples=300, deadline=None)
@given(pre=_ctx, tok=_tok, post=_ctx, post2=_ctx)
def test_classifier_equivalence(pre, tok, post, post2):
    line = f"{pre}{tok}{post}{post2}"
    start = len(pre)
    end = start + len(tok)
    gold = _classify_access(line, start, end)
    eng = _PARSER._classify_access(line, start, end)
    assert gold == eng, (line, start, end, gold, eng)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from([
    "  n = a;", "  n += 1;", "  n++;", "  --m;", "  o.p = n;",
    "  const c = v;", "  let l = 1, m2 = 2;", "  k === j;",
    "  arr.map(e => e + 1);", "  t ? u = 1 : w;", "  f(g(h));",
]), min_size=0, max_size=6))
def test_rw_engine_matches_golden_bodies(body):
    src = "function f(a) {\n" + "\n".join(body) + "\n}\n"
    gold = {(t[0], t[1], t[2]) for t in parse_file(REPO, PATH, COMMIT, src)[1]}
    t = pa.Table.from_pylist(
        [{"repo": REPO, "path": PATH, "commit": COMMIT,
          "lang": "typescript", "content": src}],
        schema=CORPUS,
    )
    rows = _PARSER(file_meta_batch(t)).to_pylist()
    from hikma_engine_ray.ids import repo_id

    rid = repo_id(REPO)
    eng = {(r["subj"], r["pred"], r["obj"]) for r in rows
           if r["kind"] == "triple"
           and r["pred"] not in ("MODIFIED_IN", "HAS_COMMIT")
           and not (r["pred"] == "CONTAINS" and r["subj"] == rid)}
    assert eng == gold, (eng ^ gold, src)


def test_keyword_set_excludes_reserved():
    for kw in ("return", "await", "typeof", "undefined", "string"):
        assert kw in RW_KEYWORDS
    src = "function f() { return typeof x; }\n"
    rw = _rw_by_key(src)
    assert set(rw) == {"x#1"}


def test_ident_re_property_names_count():
    assert [m.group(1) for m in IDENT_RE.finditer("a.b(c)")] == ["a", "b", "c"]
    # '@decorator' and mid-word starts never match
    assert [m.group(1) for m in IDENT_RE.finditer("@dec 0x1f w")] == ["w"]
