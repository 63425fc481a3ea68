"""Structure-extraction parser stage (SURVEY.md §2 M5/M6 — the flagship).

A **stateful actor-pool** ``map_batches`` stage: regexes are compiled
once per actor in ``__init__`` (the reference loads its TS-compiler
parser once per process — ast-parser.ts module scope; tree-sitter slots
in behind the same interface when available, see ``_try_treesitter``),
and ``__call__`` parses a whole Arrow batch of files, emitting one
tagged-union Arrow table of node / triple / mention / definition records.

Parsing is inherently per-record work (like tokenization); the batch
loop amortizes actor state and emits columnar output — no Python-object
rows cross the stage boundary.

Implements the extraction SPEC documented in ``hikma_engine_ray.golden``
(E1-E9, C1-C3), which encodes the reference's rules:
  functions/signature-before-'{'      ast-parser.ts:145-233, :197
  arrow-fn naming from declaration    enhanced-ast-parser.ts:167-177
  classes/extends/implements/methods  enhanced-ast-parser.ts:284-340
  imports/exports                     enhanced-ast-parser.ts:396-546
  same-file call resolution           ast-parser.ts:374-396
  TestCase in test paths              ast-parser.ts:167-172
  1-based lines                       ast-parser.ts:188-189
Cross-file references leave as ``mention`` records for the entity-linking
shuffle (the latent J4 stage, enhanced-ast-parser.ts:588-604).
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

from ..ids import commit_id, entity_id, repo_id
from ..functions.rules import DYNAMIC_CALLEES, PARSED_LANGS, RW_KEYWORDS

TAGGED_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),  # node | triple | mention | definition |
                                # reexport | keycount
        # node fields
        ("node_id", pa.string()),
        ("node_type", pa.string()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("name", pa.string()),
        ("start_line", pa.int32()),
        ("end_line", pa.int32()),
        ("start_col", pa.int32()),
        ("signature", pa.string()),
        ("file_type", pa.string()),
        ("size_kb", pa.float32()),
        ("content_sha256", pa.string()),
        ("props_json", pa.string()),
        # triple fields
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("line", pa.int32()),
        ("col", pa.int32()),
        # SPEC C4: CALLS-only dynamic flag (isDynamicCall,
        # enhanced-ast-parser.ts:663-669); null on other rows
        ("dynamic", pa.bool_()),
        # mention / definition fields
        ("module", pa.string()),
        ("symbol", pa.string()),
        ("mkind", pa.string()),
        ("src_id", pa.string()),
        ("src_kind", pa.string()),
        ("def_kind", pa.string()),
    ]
)

_COLS = [f.name for f in TAGGED_SCHEMA]
_FUNCTION_LIKE = frozenset(["Function", "ArrowFunction", "Method", "TestCase"])
_DISPATCH = frozenset(
    ["import", "export", "function", "async", "const", "let", "var", "class",
     "interface", "abstract", "default"]
)


_LEX = re.compile(r"//|/\*|['\"`]")
_SQ_BODY = re.compile(r"(?:\\.|[^'\\\n])*'")
_DQ_BODY = re.compile(r'(?:\\.|[^"\\\n])*"')
_TPL_BODY = re.compile(r"(?:\\.|[^`\\])*`", re.S)


def _mask(chars: list[str], a: int, b: int) -> None:
    for k in range(a, b):
        if chars[k] != "\n":
            chars[k] = " "


def _norm_jsdoc(raw: str) -> str:
    """SPEC P7: JSDoc comment text — body between ``/**`` and ``*/``
    with each line's leading ``*`` (plus one following space) stripped,
    whole result trimmed (the shape ts jsDoc[0].comment exposes —
    enhanced-ast-parser.ts:631-637)."""
    body = raw[3:]
    if body.endswith("*/"):
        body = body[:-2]
    out = []
    for ln in body.split("\n"):
        t = ln.strip()
        if t.startswith("*"):
            t = t[1:]
            if t.startswith(" "):
                t = t[1:]
        out.append(t)
    return "\n".join(out).strip()


def _preprocess(content: str) -> tuple[list[str], list[str], dict[int, tuple[int, str]]]:
    """SPEC P0 lexer (engine variant: regex jumps instead of golden's
    per-char state machine — same output, property-tested against it).

    scan view: comments + template contents masked, quoted strings kept.
    brace view: scan view + quoted-string contents masked. Line
    structure preserved (masked chars → spaces). Third return: JSDoc
    blocks (``/** … */``) as {end_line_idx: (start_line_idx, text)},
    0-based, text normalized per SPEC P7."""
    scan = list(content)
    extra_str_spans: list[tuple[int, int]] = []  # quoted contents (brace only)
    jsdoc_spans: list[tuple[int, int]] = []
    pos, n = 0, len(content)
    while pos < n:
        m = _LEX.search(content, pos)
        if m is None:
            break
        tok, start = m.group(0), m.start()
        if tok == "//":
            end = content.find("\n", start)
            end = n if end < 0 else end
            _mask(scan, start, end)
            pos = end + 1
        elif tok == "/*":
            close = content.find("*/", start + 2)
            end = n if close < 0 else close + 2
            if content.startswith("/**", start) and end - start > 4:
                jsdoc_spans.append((start, end))
            _mask(scan, start, end)
            pos = end
        elif tok == "`":
            b = _TPL_BODY.match(content, start + 1)
            end = b.end() if b else n
            _mask(scan, start + 1, max(start + 1, end - 1))
            pos = end
        else:  # ' or "
            b = (_SQ_BODY if tok == "'" else _DQ_BODY).match(content, start + 1)
            if b:
                extra_str_spans.append((start + 1, b.end() - 1))
                pos = b.end()
            else:  # unterminated: string ends at EOL
                eol = content.find("\n", start)
                eol = n if eol < 0 else eol
                extra_str_spans.append((start + 1, eol))
                pos = eol + 1
    scan_text = "".join(scan)
    brace = list(scan_text)
    for a, b_ in extra_str_spans:
        _mask(brace, a, b_)
    jsdocs: dict[int, tuple[int, str]] = {}
    if jsdoc_spans:
        import bisect

        nl = [m.start() for m in re.finditer("\n", content)]
        for a, b_ in jsdoc_spans:
            start_line = bisect.bisect_right(nl, a - 1)
            end_line = bisect.bisect_right(nl, b_ - 1)
            jsdocs[end_line] = (start_line, _norm_jsdoc(content[a:b_]))
    return scan_text.split("\n"), "".join(brace).split("\n"), jsdocs


_JSX_CODE = re.compile(r"//|/\*|['\"`]|[<{}]")
_JSX_TAG = re.compile(r"['\"{>]|/>")
_JSX_TEXT = re.compile(r"[{<]")
_JSX_NAMEISH = re.compile(r"[A-Za-z_$>]")
_JSX_EXPR_TAIL = re.compile(r"([A-Za-z_$][\w$]*)\s*$")
_JSX_EXPR_KW = frozenset("return case do else typeof await yield in of".split())


def _jsx_expr_pos(sig: str) -> bool:
    """SPEC P8: is a `<` at expression position given the significant
    emitted text so far? (Engine twin of golden's ``_expr_pos``.)"""
    t = sig.rstrip()
    if not t:
        return True
    if t.endswith("=>") or t[-1] in "([{,;=?:&|!":
        return True
    m = _JSX_EXPR_TAIL.search(t)
    return bool(m) and m.group(1) in _JSX_EXPR_KW


def _preprocess_jsx(content: str) -> tuple[list[str], list[str], dict[int, tuple[int, str]]]:
    """SPEC P0+P8 lexer for .tsx/.jsx (engine variant: span jumps
    between interesting tokens per state, masking whole spans at once —
    same output as golden's per-char machine, property-tested against
    it). JSX tag syntax, attribute strings and text are masked in BOTH
    views; `{…}` containers re-enter JS lexing (real JS braces tracked
    per container so its closing brace is found at depth 0); container
    braces themselves are masked in both views."""
    scan = list(content)
    str_spans: list[tuple[int, int]] = []  # masked in brace view only
    jsdoc_spans: list[tuple[int, int]] = []
    sig_parts: list[str] = []  # significant tail for expression position
    jstack: list[list] = []  # ["elem"] | ["expr", ret_state, js_depth]
    pos, n = 0, len(content)
    state = "code"

    def _elem_done() -> str:
        if jstack and jstack[-1][0] == "elem":
            return "text"
        sig_parts.append(" X")  # a finished element reads as a value
        return "code"

    while pos < n:
        if state == "code":
            m = _JSX_CODE.search(content, pos)
            if m is None:
                break
            tok, start = m.group(0), m.start()
            sig_parts.append(content[pos:start])
            if len(sig_parts) > 24:
                del sig_parts[:-12]
            if tok == "//":
                end = content.find("\n", start)
                end = n if end < 0 else end
                _mask(scan, start, end)
                sig_parts.append(" ")
                pos = end + 1
            elif tok == "/*":
                close = content.find("*/", start + 2)
                end = n if close < 0 else close + 2
                if content.startswith("/**", start) and end - start > 4:
                    jsdoc_spans.append((start, end))
                _mask(scan, start, end)
                sig_parts.append(" ")
                pos = end
            elif tok == "`":
                b = _TPL_BODY.match(content, start + 1)
                end = b.end() if b else n
                _mask(scan, start + 1, max(start + 1, end - 1))
                sig_parts.append("``")
                pos = end
            elif tok in ("'", '"'):
                b = (_SQ_BODY if tok == "'" else _DQ_BODY).match(content, start + 1)
                if b:
                    str_spans.append((start + 1, b.end() - 1))
                    sig_parts.append(content[start : b.end()])
                    pos = b.end()
                else:
                    eol = content.find("\n", start)
                    eol = n if eol < 0 else eol
                    str_spans.append((start + 1, eol))
                    sig_parts.append(content[start:eol])
                    pos = eol + 1
            elif tok == "<":
                nxt = content[start + 1 : start + 2]
                if nxt and _JSX_NAMEISH.match(nxt) and _jsx_expr_pos("".join(sig_parts)):
                    _mask(scan, start, start + 1)
                    state = "tag"
                else:
                    sig_parts.append("<")
                pos = start + 1
            elif tok == "{":
                if jstack and jstack[-1][0] == "expr":
                    jstack[-1][2] += 1
                sig_parts.append("{")
                pos = start + 1
            else:  # "}"
                if jstack and jstack[-1][0] == "expr" and jstack[-1][2] == 0:
                    fr = jstack.pop()
                    state = fr[1]
                    _mask(scan, start, start + 1)
                else:
                    if jstack and jstack[-1][0] == "expr":
                        jstack[-1][2] -= 1
                    sig_parts.append("}")
                pos = start + 1
        elif state == "tag":
            m = _JSX_TAG.search(content, pos)
            if m is None:
                _mask(scan, pos, n)
                break
            tok, start = m.group(0), m.start()
            _mask(scan, pos, start)
            if tok in ("'", '"'):  # attribute value: no escapes, may span lines
                close = content.find(tok, start + 1)
                end = n if close < 0 else close + 1
                _mask(scan, start, end)
                pos = end
            elif tok == "{":
                jstack.append(["expr", "tag", 0])
                _mask(scan, start, start + 1)
                sig_parts.append(" (")
                state = "code"
                pos = start + 1
            elif tok == "/>":
                _mask(scan, start, start + 2)
                state = _elem_done()
                pos = start + 2
            else:  # ">" — element body opens
                jstack.append(["elem"])
                _mask(scan, start, start + 1)
                state = "text"
                pos = start + 1
        else:  # "text"
            m = _JSX_TEXT.search(content, pos)
            if m is None:
                _mask(scan, pos, n)
                break
            tok, start = m.group(0), m.start()
            _mask(scan, pos, start)
            if tok == "{":
                jstack.append(["expr", "text", 0])
                _mask(scan, start, start + 1)
                sig_parts.append(" (")
                state = "code"
                pos = start + 1
            elif content.startswith("</", start):  # closing tag
                close = content.find(">", start)
                end = n if close < 0 else close + 1
                _mask(scan, start, end)
                if jstack and jstack[-1][0] == "elem":
                    jstack.pop()
                state = _elem_done()
                pos = end
            else:  # child element opens
                _mask(scan, start, start + 1)
                state = "tag"
                pos = start + 1
    scan_text = "".join(scan)
    brace = list(scan_text)
    for a, b_ in str_spans:
        _mask(brace, a, b_)
    jsdocs: dict[int, tuple[int, str]] = {}
    if jsdoc_spans:
        import bisect

        nl = [m.start() for m in re.finditer("\n", content)]
        for a, b_ in jsdoc_spans:
            start_line = bisect.bisect_right(nl, a - 1)
            end_line = bisect.bisect_right(nl, b_ - 1)
            jsdocs[end_line] = (start_line, _norm_jsdoc(content[a:b_]))
    return scan_text.split("\n"), "".join(brace).split("\n"), jsdocs


def _try_treesitter():
    """tree-sitter grammars are not shipped in this container; the regex
    scanner below is the real implementation. If tree_sitter + grammars
    are importable, a TS/JS Language could be swapped in here behind the
    same per-file interface."""
    try:  # pragma: no cover - not available in this environment
        import tree_sitter  # noqa: F401

        return None  # no grammar wheels present; fall through to regex
    except ImportError:
        return None


class _Out:
    """Columnar builders for the tagged-union output table.

    Sparse: each row touches only its ~8 populated fields; the other
    ~19 columns materialize as nulls at table-build time (a np.full +
    fancy-index per column) instead of 27 Python appends per row."""

    __slots__ = ("n", "kinds", "idx", "val")

    def __init__(self):
        self.n = 0
        self.kinds: list[str] = []
        self.idx: dict[str, list[int]] = {c: [] for c in _COLS[1:]}
        self.val: dict[str, list] = {c: [] for c in _COLS[1:]}

    def row(self, kind: str, **kw):
        i = self.n
        self.n = i + 1
        self.kinds.append(kind)
        idx, val = self.idx, self.val
        for k, v in kw.items():
            idx[k].append(i)
            val[k].append(v)

    def table(self) -> pa.Table:
        import numpy as np

        n = self.n
        arrays = [pa.array(self.kinds, pa.string())]
        for f in TAGGED_SCHEMA:
            if f.name == "kind":
                continue
            ix = self.idx[f.name]
            if len(ix) == n:  # dense column: no null fill needed
                arrays.append(pa.array(self.val[f.name], f.type))
                continue
            col = np.full(n, None, dtype=object)
            if ix:
                col[ix] = self.val[f.name]
            arrays.append(pa.array(col, f.type))
        return pa.Table.from_arrays(arrays, schema=TAGGED_SCHEMA)


class _BraceIndex:
    """Per-file brace bookkeeping over the brace view.

    Per-line open/close counts come from C-speed ``str.count``; the
    exact per-char scan runs only on lines where a zero-crossing or
    clamp is possible (current depth ≤ closes on the line). Semantically
    identical to scanning every character — the fast paths apply only
    when order inside the line provably cannot matter."""

    __slots__ = ("lines", "opens", "closes")

    def __init__(self, brace_lines: list[str]):
        self.lines = brace_lines
        self.opens = [l.count("{") for l in brace_lines]
        self.closes = [l.count("}") for l in brace_lines]

    def depth_after(self, depth: int, idx: int) -> int:
        c = self.closes[idx]
        if c == 0:
            return depth + self.opens[idx]
        if depth >= c:  # prefix minimum ≥ 0 → clamp can't trigger
            return depth + self.opens[idx] - c
        for ch in self.lines[idx]:
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth = max(0, depth - 1)
        return depth

    def brace_end(self, start_idx: int) -> int:
        """Line index of the close matching the first '{' at/after
        start_idx (same clamped semantics as the per-char scan)."""
        n = len(self.lines)
        depth = 0
        opened = False
        i = start_idx
        while i < n:
            o, c = self.opens[i], self.closes[i]
            if opened:
                if c == 0:
                    depth += o
                    i += 1
                    continue
                if depth > c:  # cannot reach zero on this line
                    depth += o - c
                    i += 1
                    continue
            elif o == 0 and c == 0:
                i += 1
                continue
            for ch in self.lines[i]:
                if ch == "{":
                    depth += 1
                    opened = True
                elif ch == "}":
                    depth = max(0, depth - 1)
                    if opened and depth == 0:
                        return i
            i += 1
        return n - 1


class ParseFiles:
    """Callable class for ``ds.map_batches(ParseFiles, concurrency=N,
    batch_format="pyarrow")``. Expects the file_meta columns to be
    present (file_id, content_sha256, size_kb, lang_detected, file_type,
    is_test)."""

    def __init__(self):
        n = r"[^\W\d][\w$]*"
        U = re.UNICODE
        self.re_func = re.compile(
            rf"^(\s*)(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s+({n})\s*\(", U
        )
        self.re_arrow = re.compile(
            rf"^(\s*)(?:export\s+)?(?:const|let|var)\s+({n})\s*=\s*(?:async\s*)?\([^)]*\)\s*(?::[^=]+)?=>",
            U,
        )
        self.re_var = re.compile(
            rf"^(\s*)(?:export\s+)?(const|let|var)\s+({n})\s*=\s*(.+)$", U
        )
        self.re_class = re.compile(
            rf"^(\s*)(?:export\s+)?(?:default\s+)?(?:abstract\s+)?class\s+({n})"
            rf"(?:\s+extends\s+([\w$.]+))?(?:\s+implements\s+([\w$,\s]+?))?\s*\{{",
            U,
        )
        self.re_iface = re.compile(rf"^(\s*)(?:export\s+)?interface\s+({n})", U)
        self.re_method = re.compile(
            rf"^(\s*)(?:(?:public|private|protected|static|async|get|set)\s+)*({n})\s*\([^)]*\)\s*\{{",
            U,
        )
        self.re_import = re.compile(
            r"^(\s*)import\s+(?:(.+?)\s+from\s+)?['\"]([^'\"]+)['\"]", U
        )
        self.re_import_start = re.compile(r"^(\s*)import\b", U)
        self.re_export_list = re.compile(r"^(\s*)export\s+\{([^}]*)\}", U)
        self.re_export_list_start = re.compile(r"^(\s*)export\s+\{", U)
        # SPEC E8b/E8c (golden.py): re-export forms. Named re-exports are
        # never same-file resolved; star re-exports emit no entity.
        self.re_export_from = re.compile(
            r"^(\s*)export\s+\{([^}]*)\}\s*from\s*['\"]([^'\"]+)['\"]", U
        )
        self.re_export_star = re.compile(
            r"^(\s*)export\s+\*\s+from\s+['\"]([^'\"]+)['\"]", U
        )
        self.re_export_default = re.compile(
            rf"^(\s*)export\s+default\s+({n})\s*;?\s*$", U
        )
        self.re_decorator = re.compile(rf"^(\s*)@({n})", U)
        # '@' in the lookbehind: decorator invocations are not call sites
        self.re_call = re.compile(rf"(?<![\w$.@])({n})\s*\(", U)
        # SPEC C2b: direct two-part member calls `NS.member(` — the
        # lookbehind excludes `a.b.c(` chains; golden.MEMBER_CALL_RE twin
        self.re_member_call = re.compile(rf"(?<![\w$.@])({n})\.({n})\s*\(", U)
        # SPEC v3 R2: variable accesses — '.' absent from the lookbehind
        # (property names are ts.Identifiers too); golden.IDENT_RE twin
        self.re_ident = re.compile(rf"(?<![\w$@])({n})", U)
        # SPEC v3 R3 right-context: ++/-- operand, or plain '=' that is
        # not '=='/'=>' (regex twin of golden._classify_access)
        self.re_access_after = re.compile(r" *(\+\+|--|=(?![=>]))")
        # declaration keyword immediately before the token → the '=' is
        # a VariableDeclaration initializer, not an assignment
        self.re_decl_tail = re.compile(r"(?:^|[^\w$])(?:const|let|var)$")
        self.rw_keywords = RW_KEYWORDS
        self.max_join = 20  # physical lines joined into one logical stmt
        self.call_keywords = frozenset(
            "if for while switch catch function return new typeof await else do "
            "import export async const let var super this constructor".split()
        )
        self.method_not = frozenset(
            "if for while switch catch function return".split()
        )
        self._ts = _try_treesitter()

    # ------------------------------------------------------------------ batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = _Out()
        cols = {
            name: batch[name].to_pylist()
            for name in (
                "repo", "path", "commit", "lang", "content", "file_id",
                "content_sha256", "size_kb", "lang_detected", "file_type",
                "is_test",
            )
        }
        seen_repo: set[str] = set()
        seen_commit: set[tuple[str, str]] = set()
        self._keycounts: dict[tuple[str, str], int] = {}
        for i in range(batch.num_rows):
            self._emit_file_level(out, cols, i, seen_repo, seen_commit)
            if cols["lang_detected"][i] in PARSED_LANGS:
                try:
                    self._parse_one(out, cols, i)
                except Exception:
                    # skip-with-warning semantics (ast-parser.ts:80-82):
                    # a malformed file must never kill the stage.
                    pass
        # per-batch partial mention-key counts, folded into the parse
        # output so hot-key detection needs NO extra pass over the corpus
        # (one 'keycount' row per distinct (repo, base) per batch; the
        # count rides in the int32 'line' column)
        for (repo, base), n in self._keycounts.items():
            out.row("keycount", repo=repo, module=base, line=min(n, 2**31 - 1))
        return out.table()

    def _count_key(self, repo: str, path: str, spec: str):
        from .linking import mention_base

        k = (repo, mention_base(path, spec))
        self._keycounts[k] = self._keycounts.get(k, 0) + 1

    # ------------------------------------------------------- file-level rows

    def _emit_file_level(self, out, cols, i, seen_repo, seen_commit):
        repo, path, commit = cols["repo"][i], cols["path"][i], cols["commit"][i]
        fid = cols["file_id"][i]
        rid = repo_id(repo)
        cid = commit_id(commit)
        if repo not in seen_repo:  # batch-local dedup; global dedup downstream
            seen_repo.add(repo)
            out.row("node", node_id=rid, node_type="Repository", repo=repo, name=repo)
        if (repo, commit) not in seen_commit:
            seen_commit.add((repo, commit))
            out.row("node", node_id=cid, node_type="Commit", repo=repo,
                    commit=commit, name=commit)
            out.row("triple", subj=rid, pred="HAS_COMMIT", obj=cid, repo=repo)
        out.row(
            "node", node_id=fid, node_type="File", repo=repo, path=path,
            commit=commit, lang=cols["lang"][i], name=path,
            content_sha256=cols["content_sha256"][i], size_kb=cols["size_kb"][i],
            file_type=cols["file_type"][i],
            props_json=json.dumps({"lang_detected": cols["lang_detected"][i]}),
        )
        out.row("triple", subj=rid, pred="CONTAINS", obj=fid, repo=repo)
        out.row("triple", subj=fid, pred="MODIFIED_IN", obj=cid, repo=repo)
        # file-existence definition: resolves `import ... from './x'` targets
        out.row("definition", repo=repo, module=path, symbol="", obj=fid,
                def_kind="File", commit=commit)

    # ------------------------------------------------------------- one file

    def _parse_one(self, out, cols, i):
        repo, path, commit = cols["repo"][i], cols["path"][i], cols["commit"][i]
        fid = cols["file_id"][i]
        content: str = cols["content"][i]
        is_test = bool(cols["is_test"][i])
        # SPEC P0: scan view for regexes/signatures/calls, brace view for
        # nesting (comments, templates, string braces never count).
        # SPEC P8: .tsx/.jsx paths go through the JSX-aware lexer.
        if path.endswith((".tsx", ".jsx")):
            lines, brace_lines, jsdocs = _preprocess_jsx(content)
        else:
            lines, brace_lines, jsdocs = _preprocess(content)
        nlines = len(lines)
        bidx = _BraceIndex(brace_lines)

        # (kind, name, line1, col, end1, sig, exported, props)
        ents: list[list] = []
        imports: dict[str, str] = {}
        ns_imports: dict[str, str] = {}  # namespace local -> spec (C2b)
        import_stmts: list[tuple[str, int, int]] = []
        export_lists: list[tuple[list[str], int, int]] = []
        export_defaults: list[tuple[str, int, int]] = []
        inline_exported: set[str] = set()
        # E8b/E8c: (spec, {exported: source} | '*', stmt_line)
        reexports: list[tuple] = []
        class_idx: list[int] = []
        pending_dec: list[str] = []

        depth = 0
        idx = 0
        while idx < nlines:
            line = lines[idx]
            s = line.lstrip()
            consumed = 1
            if s.startswith("@"):
                md = self.re_decorator.match(line)
                if md:
                    pending_dec.append(md.group(2))
                    s = ""  # handled; fall through to depth bookkeeping
            if s:
                tok = s.split(" ", 1)[0].split("(", 1)[0]
                res = (
                    self._dispatch(
                        out, lines, brace_lines, bidx, idx, line, depth,
                        is_test, ents, imports, ns_imports, import_stmts,
                        export_lists, export_defaults, inline_exported,
                        reexports, class_idx, pending_dec,
                    )
                    if tok in _DISPATCH
                    else 0
                )
                if res == 0:  # unhandled non-blank line drops the queue
                    pending_dec.clear()
                else:
                    consumed = res
            for k in range(idx, idx + consumed):
                depth = bidx.depth_after(depth, k)
            idx += consumed

        # in-file triple dedup: every triple this file emits goes through
        # seen_triples, so the file's output is duplicate-free by
        # construction (global dedup then only handles cross-file streams)
        seen_triples: set[tuple] = set()

        def triple(subj, pred, obj, line1, col, dynamic=None):
            t = (subj, pred, obj)
            if t in seen_triples:
                return
            seen_triples.add(t)
            if dynamic is None:
                out.row("triple", subj=subj, pred=pred, obj=obj, repo=repo,
                        line=line1, col=col)
            else:
                out.row("triple", subj=subj, pred=pred, obj=obj, repo=repo,
                        line=line1, col=col, dynamic=dynamic)

        # ---- methods within class ranges
        for ci in class_idx:
            ckind, cname, cline, ccol, cend, _csig, _cexp = ents[ci][:7]
            skip_until = 0
            for idx in range(cline, cend - 1):
                if idx + 1 <= skip_until:
                    continue
                m = self.re_method.match(lines[idx])
                if not m or m.group(2) in self.method_not:
                    continue
                indent = len(m.group(1))
                if indent <= ccol:
                    continue
                end = bidx.brace_end(idx) + 1
                sig = self._sig(lines[idx], indent, "{")
                # method decorators: immediately preceding @/blank lines
                mprops: dict = {}
                back = idx - 1
                decs: list[str] = []
                while back >= 0:
                    md = self.re_decorator.match(lines[back])
                    if md:
                        decs.insert(0, md.group(2))
                        back -= 1
                        continue
                    if lines[back].strip() == "":
                        back -= 1
                        continue
                    break
                if decs:
                    mprops["decorators"] = decs
                ents.append(["Method", m.group(2), idx + 1, indent, end, sig,
                             False, mprops])
                skip_until = end
                eid = entity_id(fid, "Method", m.group(2), idx + 1, indent)
                cls_eid = entity_id(fid, ckind, cname, cline, ccol)
                triple(cls_eid, "CONTAINS", eid, idx + 1, indent)

        # ---- SPEC P7: JSDoc docstrings. Walk the leading-trivia run
        # above each declaration (blank lines, decorators, comment
        # interiors — all scan-blank) and attach the TOPMOST JSDoc in
        # the run, matching ts jsDoc[0] (enhanced-ast-parser.ts:143,
        # 206, 260, 631-637).
        if jsdocs:
            for e in ents:
                b = e[2] - 2  # 0-based index of the line above the decl
                found = ""
                while b >= 0:
                    j = jsdocs.get(b)
                    if j is not None:
                        found = j[1]
                        b = j[0] - 1
                        continue
                    s = lines[b].strip()
                    if s == "" or self.re_decorator.match(lines[b]):
                        b -= 1
                        continue
                    break
                if found:
                    if len(e) > 7:
                        e[7]["docstring"] = found
                    else:
                        e.append({"docstring": found})

        # ---- ids (node rows are emitted AFTER the call scan so that
        # per-function call aggregates A1/A2 can land in props_json)
        eids: list[str] = [
            entity_id(fid, e[0], e[1], e[2], e[3]) for e in ents
        ]

        # ---- name-resolution tables (first by start_line)
        by_kind_name: dict[tuple[str, str], int] = {}
        order = sorted(range(len(ents)), key=lambda k: ents[k][2])
        for k in order:
            by_kind_name.setdefault((ents[k][0], ents[k][1]), k)

        def resolve(name: str, kinds: tuple) -> int | None:
            for kd in kinds:
                j = by_kind_name.get((kd, name))
                if j is not None:
                    return j
            return None

        TYPE_KINDS = ("Class", "Interface")
        ANY_KINDS = ("Function", "TestCase", "ArrowFunction", "Class",
                     "Interface", "Variable", "Method")

        # ---- EXTENDS / IMPLEMENTS
        for ci in class_idx:
            e = ents[ci]
            extra = e[7] if len(e) > 7 else {}
            cls_eid = eids[ci]
            ext = extra.get("extends", "")
            if ext:
                j = resolve(ext, TYPE_KINDS)
                if j is not None:
                    triple(cls_eid, "EXTENDS", eids[j], e[2], e[3])
                elif ext in imports:
                    # external specs too: linking dangles them (J7)
                    self._count_key(repo, path, imports[ext])
                    out.row("mention", repo=repo, path=path, module=imports[ext],
                            symbol=ext, mkind="extends", src_id=cls_eid,
                            src_kind="Class", line=e[2], col=e[3])
            for nm in [x.strip() for x in extra.get("implements", "").split(",") if x.strip()]:
                j = resolve(nm, TYPE_KINDS)
                if j is not None:
                    triple(cls_eid, "IMPLEMENTS", eids[j], e[2], e[3])
                elif nm in imports:
                    self._count_key(repo, path, imports[nm])
                    out.row("mention", repo=repo, path=path, module=imports[nm],
                            symbol=nm, mkind="implements", src_id=cls_eid,
                            src_kind="Class", line=e[2], col=e[3])

        # ---- EXPORTS + definitions
        def _export(name: str, line1: int, col: int):
            j = resolve(name, ANY_KINDS)
            if j is None:
                return
            triple(fid, "EXPORTS", eids[j], line1, col)
            out.row("definition", repo=repo, module=path, symbol=name,
                    obj=eids[j], def_kind=ents[j][0], commit=commit)

        for names, line1, col in export_lists:
            for nm in names:
                _export(nm, line1, col)
        for nm, line1, col in export_defaults:
            _export(nm, line1, col)
        for nm in inline_exported:
            j = resolve(nm, ANY_KINDS)
            if j is not None:
                _export(nm, ents[j][2], ents[j][3])

        # ---- calls: stack-based innermost attribution (C1-C3)
        funclike = sorted(
            (k for k in range(len(ents)) if ents[k][0] in _FUNCTION_LIKE),
            key=lambda k: (ents[k][2], -ents[k][4]),
        )
        fl_by_name: dict[str, int] = {}
        for k in funclike:
            fl_by_name.setdefault(ents[k][1], k)
        local_calls: dict[int, set[int]] = {}
        called_by: dict[int, set[int]] = {}
        external_calls: dict[int, set[str]] = {}
        stack: list[int] = []
        fi = 0
        for idx in range(nlines):
            line1 = idx + 1
            while stack and ents[stack[-1]][4] < line1:
                stack.pop()
            while fi < len(funclike) and ents[funclike[fi]][2] == line1:
                stack.append(funclike[fi])
                fi += 1
            if not stack:
                continue
            # innermost = max start_line among active entities
            owner = max(stack, key=lambda k: ents[k][2])
            oent = ents[owner]
            line = lines[idx]
            for m in self.re_call.finditer(line):
                callee = m.group(1)
                if callee in self.call_keywords:
                    continue
                if line1 == oent[2] and callee == oent[1]:
                    continue  # own definition
                j = fl_by_name.get(callee)
                if j is not None:
                    triple(eids[owner], "CALLS", eids[j], line1, m.start(1),
                           dynamic=callee in DYNAMIC_CALLEES)
                    local_calls.setdefault(owner, set()).add(j)
                    called_by.setdefault(j, set()).add(owner)
                elif callee in imports:
                    # external (bare) specifiers become mentions too — the
                    # linking stage resolves them to nothing and reports
                    # them dangling (no-such-module), matching golden
                    external_calls.setdefault(owner, set()).add(callee)
                    self._count_key(repo, path, imports[callee])
                    out.row("mention", repo=repo, path=path,
                            module=imports[callee], symbol=callee, mkind="call",
                            src_id=eids[owner], src_kind=oent[0],
                            line=line1, col=m.start(1))
            if ns_imports:
                # C2b: NS.member( through a namespace import — the callee
                # is the PROPERTY name (enhanced-ast-parser.ts:582-585),
                # resolved through the import's module in linking
                for m in self.re_member_call.finditer(line):
                    spec = ns_imports.get(m.group(1))
                    if spec is None:
                        continue
                    self._count_key(repo, path, spec)
                    out.row("mention", repo=repo, path=path,
                            module=spec, symbol=m.group(2), mkind="call",
                            src_id=eids[owner], src_kind=oent[0],
                            line=line1, col=m.start(1))
            # SPEC v3 R1-R4: variable-access edges (READS/WRITES). On
            # the owner's declaration line only text after the body
            # opener participates (brace view finds the opener; strings
            # can't fake it there).
            if line1 == oent[2]:
                bl = brace_lines[idx]
                if oent[0] == "ArrowFunction":
                    p = bl.find("=>")
                    boff = p + 2 if p >= 0 else len(line)
                else:
                    p = bl.find("{")
                    boff = p + 1 if p >= 0 else len(line)
            else:
                boff = 0
            owner_eid = eids[owner]
            for m in self.re_ident.finditer(line, boff):
                nm = m.group(1)
                if nm in self.rw_keywords:
                    continue
                acc = self._classify_access(line, m.start(1), m.end(1))
                triple(owner_eid, acc, f"{fid}#{nm}#{line1}", line1,
                       m.start(1))

        # ---- E8b/E8c re-export records → one tagged row per routed pair
        # (star = one '*' row); consumed by linking.synthesize_reexports.
        # Metadata-sized: one row per re-export name per statement.
        for spec, pairs, line1 in reexports:
            if pairs == "*":
                out.row("reexport", repo=repo, path=path, module=spec,
                        symbol="*", name="*", commit=commit, line=line1)
            else:
                for exported, source in pairs.items():
                    out.row("reexport", repo=repo, path=path, module=spec,
                            symbol=exported, name=source, commit=commit,
                            line=line1)

        # ---- IMPORTS: internal → mention; external → triple
        for spec, line1, col in import_stmts:
            if spec.startswith("."):
                self._count_key(repo, path, spec)
                out.row("mention", repo=repo, path=path, module=spec, symbol="",
                        mkind="import", src_id=fid, src_kind="File",
                        line=line1, col=col)
            else:
                triple(fid, "IMPORTS", f"module:{spec}", line1, col)

        # ---- A2: transitive call depth over the file-local call graph
        # (reference ast-parser.ts:440-449 — DFS, cycle-guarded). Local
        # by design: never a distributed iteration.
        depth_memo: dict[int, int] = {}

        def call_depth(k: int, visiting: set[int]) -> int:
            if k in depth_memo:
                return depth_memo[k]
            if k in visiting:
                return 0  # cycle guard
            visiting.add(k)
            d = 0
            for nxt in local_calls.get(k, ()):
                d = max(d, 1 + call_depth(nxt, visiting))
            visiting.discard(k)
            depth_memo[k] = d
            return d

        # ---- node rows + DEFINED_IN (with A1/A2 aggregates in props)
        for k, e in enumerate(ents):
            kind, name, line1, col, end1, sig, exported = e[:7]
            eid = eids[k]
            props = {"exported": bool(exported)}
            if len(e) > 7:
                props.update(e[7])
            if kind in _FUNCTION_LIKE:
                props["calls_methods"] = sorted(
                    ents[j][1] for j in local_calls.get(k, ())
                )
                props["called_by_methods"] = sorted(
                    ents[j][1] for j in called_by.get(k, ())
                )
                props["uses_external_methods"] = bool(external_calls.get(k))
                props["transitive_call_depth"] = call_depth(k, set())
            out.row(
                "node", node_id=eid, node_type=kind, repo=repo, path=path,
                commit=commit, lang=cols["lang_detected"][i], name=name,
                start_line=line1, end_line=end1, start_col=col, signature=sig,
                props_json=json.dumps(props, sort_keys=True),
            )
            triple(eid, "DEFINED_IN", fid, line1, col)

    # ------------------------------------------------------------- dispatch

    def _join_stmt(self, lines, idx, done):
        """Join physical lines from idx into one logical statement until
        ``done(text)``; returns (text, n_lines)."""
        buf = lines[idx]
        k = 1
        while not done(buf) and k < self.max_join and idx + k < len(lines):
            buf = buf + " " + lines[idx + k].strip()
            k += 1
        return buf, k

    def _dispatch(self, out, lines, brace_lines, bidx, idx, line, depth,
                  is_test, ents, imports, ns_imports, import_stmts,
                  export_lists, export_defaults, inline_exported,
                  reexports, class_idx, pending_dec) -> int:
        """Handle one (possibly multi-line) statement; returns the number
        of physical lines consumed (0 = not handled)."""
        line1 = idx + 1

        def take_dec() -> dict:
            if not pending_dec:
                return {}
            d = {"decorators": list(pending_dec)}
            pending_dec.clear()
            return d

        consumed = 1
        m = self.re_import.match(line)
        if m is None and self.re_import_start.match(line):
            joined, njoin = self._join_stmt(
                lines, idx, lambda s: self.re_import.match(s)
            )
            m = self.re_import.match(joined)
            if m:
                line, consumed = joined, njoin
        if m:
            pending_dec.clear()
            indent, clause, spec = m.groups()
            col = len(indent)
            ents.append(["Import", spec, line1, col, line1 + consumed - 1,
                         line.strip().rstrip(";"), False, {}])
            import_stmts.append((spec, line1, col))
            if clause:
                for local in self._import_locals(clause):
                    imports[local] = spec
                for local in self._import_ns_locals(clause):
                    ns_imports[local] = spec
            return consumed
        m = self.re_export_list.match(line)
        if m is None and self.re_export_list_start.match(line):
            joined, njoin = self._join_stmt(lines, idx, lambda s: "}" in s)
            m = self.re_export_list.match(joined)
            if m:
                line, consumed = joined, njoin
        if m:
            pending_dec.clear()
            col = len(m.group(1))
            mf = self.re_export_from.match(line)
            if mf:
                # E8b: named re-export — exported names are routed pairs,
                # never same-file resolved; no EXPORTS triple
                pairs: dict[str, str] = {}
                for part in mf.group(2).split(","):
                    part = part.strip()
                    if not part:
                        continue
                    bits = [b.strip() for b in part.split(" as ")]
                    pairs[bits[-1]] = bits[0]
                joined_names = ",".join(pairs)
                ents.append(["Export", joined_names, line1, col,
                             line1 + consumed - 1, line.strip().rstrip(";"),
                             False, {}])
                reexports.append((mf.group(3), pairs, line1))
                return consumed
            names = [x.strip().split(" as ")[-1].strip()
                     for x in m.group(2).split(",") if x.strip()]
            ents.append(["Export", ",".join(names), line1, col,
                         line1 + consumed - 1, line.strip().rstrip(";"),
                         False, {}])
            export_lists.append((names, line1, col))
            return consumed
        m = self.re_export_star.match(line)
        if m:
            pending_dec.clear()
            reexports.append((m.group(2), "*", line1))  # E8c: no entity
            return 1
        m = self.re_export_default.match(line)
        if m:
            pending_dec.clear()
            col = len(m.group(1))
            ents.append(["Export", "default", line1, col, line1,
                         line.strip().rstrip(";"), False, {}])
            export_defaults.append((m.group(2), line1, col))
            return 1
        m = self.re_func.match(line)
        if m:
            col = len(m.group(1))
            kind = "TestCase" if is_test else "Function"
            end = bidx.brace_end(idx) + 1
            exported = line[col:].startswith("export")
            ents.append([kind, m.group(2), line1, col, end,
                         self._sig(line, col, "{"), exported, take_dec()])
            if exported:
                inline_exported.add(m.group(2))
            return 1
        m = self.re_arrow.match(line)
        if m:
            col = len(m.group(1))
            after = brace_lines[idx].split("=>", 1)[-1]
            end = bidx.brace_end(idx) + 1 if "{" in after else line1
            exported = line[col:].startswith("export")
            ents.append(["ArrowFunction", m.group(2), line1, col, end,
                         self._sig(line, col, "=>"), exported, take_dec()])
            if exported:
                inline_exported.add(m.group(2))
            return 1
        m = self.re_class.match(line)
        if m:
            indent, name, ext, impl = m.groups()
            col = len(indent)
            end = bidx.brace_end(idx) + 1
            exported = line[col:].startswith("export")
            props = {"extends": ext or "", "implements": impl or ""}
            props.update(take_dec())
            ents.append(["Class", name, line1, col, end, self._sig(line, col, "{"),
                         exported, props])
            class_idx.append(len(ents) - 1)
            if exported:
                inline_exported.add(name)
            return 1
        m = self.re_iface.match(line)
        if m:
            col = len(m.group(1))
            end = bidx.brace_end(idx) + 1
            exported = line[col:].startswith("export")
            ents.append(["Interface", m.group(2), line1, col, end,
                         self._sig(line, col, "{"), exported, take_dec()])
            if exported:
                inline_exported.add(m.group(2))
            return 1
        m = self.re_var.match(line)
        if m and depth == 0:
            indent, vkind, name, value = m.groups()
            col = len(indent)
            exported = line[col:].startswith("export")
            props = {"kind": vkind,
                     "value_snippet": value.rstrip(";").strip()[:100]}
            props.update(take_dec())
            ents.append(["Variable", name, line1, col, line1,
                         line.strip().rstrip(";"), exported, props])
            if exported:
                inline_exported.add(name)
            return 1
        return 0

    # -------------------------------------------------------------- helpers

    def _classify_access(self, line: str, start: int, end: int) -> str:
        """SPEC v3 R3 (engine regex variant of golden._classify_access;
        property-tested equivalent). Space-only skips on both sides —
        masked chars are spaces, tabs deliberately block the match just
        like in the golden."""
        seg = line[:start].rstrip(" ")
        if seg.endswith("++") or seg.endswith("--"):
            return "WRITES"
        m = self.re_access_after.match(line, end)
        if m:
            tok = m.group(1)
            if tok in ("++", "--"):
                return "WRITES"
            # plain '=': property/type position or a declaration
            # initializer classify as READ (their AST parent is never
            # the BinaryExpression — enhanced-ast-parser.ts:679-683)
            if seg and seg[-1] in ".:":
                return "READS"
            if self.re_decl_tail.search(seg):
                return "READS"
            return "WRITES"
        return "READS"

    @staticmethod
    def _brace_end(lines: list[str], start_idx: int) -> int:
        depth = 0
        opened = False
        for i in range(start_idx, len(lines)):
            for ch in lines[i]:
                if ch == "{":
                    depth += 1
                    opened = True
                elif ch == "}":
                    depth = max(0, depth - 1)
                    if opened and depth == 0:
                        return i
        return len(lines) - 1

    @staticmethod
    def _sig(line: str, col: int, stop: str) -> str:
        seg = line[col:]
        i = seg.find(stop)
        return (seg[:i] if i >= 0 else seg).rstrip()

    @staticmethod
    def _import_ns_locals(clause: str) -> list[str]:
        """Namespace locals only (`* as X`) — the subset of _import_locals
        that C2b member-call resolution applies to (golden twin)."""
        rest = clause.strip()
        m = re.search(r"\{[^}]*\}", rest)
        if m:
            rest = (rest[: m.start()] + rest[m.end():]).strip().strip(",").strip()
        for part in rest.split(","):
            part = part.strip()
            if part.startswith("* as "):
                nm = part[5:].strip()
                if nm:
                    return [nm]
        return []

    @staticmethod
    def _import_locals(clause: str) -> list[str]:
        out = []
        clause = clause.strip()
        m = re.search(r"\{([^}]*)\}", clause)
        rest = clause
        if m:
            for part in m.group(1).split(","):
                part = part.strip()
                if part:
                    out.append(part.split(" as ")[-1].strip())
            rest = (clause[: m.start()] + clause[m.end():]).strip().strip(",").strip()
        if rest.startswith("* as "):
            out.append(rest[5:].strip())
        elif rest:
            out.append(rest.split(",")[0].strip())
        return [x for x in out if x]
