r"""Golden oracle: slow, obviously-correct triple extraction.

A straightforward per-file, multi-pass Python implementation of the
extraction SPEC (below). The distributed engine (stages/parser.py +
stages/linking.py) implements the same spec with vectorized batch code
and a Ray groupby shuffle; the P/R ≥ 0.95 gate (BASELINE.json) scores
the engine's (subj, pred, obj) set against this oracle's.

=========================== EXTRACTION SPEC ===========================
Derived from the reference's rules (file:line cites into /root/reference):

Preprocessing (SPEC v2 — approximates the reference's real TS-compiler
lexing, which ignores comments and tokenizes strings/templates;
ast-parser.ts:145-179 / enhanced-ast-parser.ts:75-109 parse with the
compiler, so none of these constructs confuse it):
  P0. Before scanning, content is lexed into two line views with
      identical line structure (masked chars become spaces):
        scan view  — for all regex matching, signatures, call sites:
          * line comments ``//…`` and block comments ``/* … */``
            (multi-line) masked;
          * template-literal contents masked (backticks kept; backslash
            escapes honored; interpolation braces are masked with the
            rest — calls inside the interpolations are out of spec);
          * single/double-quoted string contents KEPT (import specs
            live there); strings end at the closing quote or end of
            line (JS strings cannot span lines).
        brace view — for brace matching / depth tracking only: same as
          scan view but quoted-string contents are masked too, so
          braces inside any literal or comment never affect nesting.

Per corpus row (repo, path, commit, lang, content):
  F0. if len(content_bytes) > 1 MiB → skip row entirely
      (src/config/index.ts:128, file-scanner.ts:78-83).
  F1. File node: id = file_id(repo, commit, path); content_sha256 =
      sha256(content) (file-scanner.ts:195); triples
      CONTAINS(repo_id → file_id) and MODIFIED_IN(file_id → commit:{sha}).
  F2. Repository node per repo (id = repo_id), Commit node per
      (repo, commit) (id = commit:{sha}, git-analyzer.ts:139-141),
      HAS_COMMIT(repo_id → commit_id).
  F3. Entities are extracted only when detect_language(path) ∈
      {typescript, javascript} (ast-parser.ts:72-79).

Entity extraction (1-based lines, 0-based cols = indentation width):
  E1. function declaration  ^(indent)(export )?(default )?(async )?function NAME(
      → Function node — or TestCase when is_test_path(path)
      (ast-parser.ts:167-172). signature = decl-line text from start_col
      to before the first '{' (ast-parser.ts:197), rstripped.
      end_line by brace matching (naive char count, depth clamped ≥ 0).
  E2. arrow function  ^(indent)(export )?(const|let|var) NAME = (async )?(args) =>
      → ArrowFunction node named from its declaration
      (enhanced-ast-parser.ts:167-177). signature = text before '=>'.
      end_line: brace-matched when body opens '{', else the decl line.
  E3. module-scope variable  (brace-depth 0, not an arrow) → Variable
      node, props kind=const|let|var, value_snippet = value[:100]
      (enhanced-ast-parser.ts:342-394 truncates to 100).
  E4. class  ^(indent)(export )?(default )?(abstract )?class NAME
      [extends X] [implements I1, I2] → Class node
      (enhanced-ast-parser.ts:284-340); EXTENDS / IMPLEMENTS resolved
      same-file first, else mention for cross-file linking, else dangling.
  E5. interface → Interface node (ast-parser.ts:235-265).
  E6. method: inside a class body at class-depth+1, ^(indent)
      (public|private|protected|static|async|get|set)* NAME(args) {
      with NAME not a control keyword → Method node;
      CONTAINS(class → method).
  E6b. decorators (enhanced-ast-parser.ts:284-340): a line ``@NAME`` /
      ``@NAME(...)`` (scan view) queues NAME; the queue attaches as
      props ``decorators`` to the next declared entity (blank lines may
      intervene; any other line clears the queue). Method decorators
      collect from the immediately preceding decorator/blank lines.
      Decorator lines are never call sites (C2).
  E7. imports  ^import [clause from] 'spec'  — the statement may span
      MULTIPLE physical lines (enhanced-ast-parser.ts:396-546 clause
      parsing): when a line starts ``import`` but carries no quoted
      spec, following lines are joined (≤ 20) until the statement
      regex matches; entity position = first line
      → Import node per statement (name = spec); named/default/namespace
      locals recorded (enhanced-ast-parser.ts:396-468); IMPORTS triple:
      internal spec (starts with '.') resolved via resolve_module against
      the repo's path set → IMPORTS(file → target_file_id) where the
      target file version is the one with the lexicographically greatest
      commit sha (deterministic "latest"); external →
      IMPORTS(file → "module:{spec}").
  E8. exports: `export { a, b };` (the list may span multiple lines,
      joined like E7 until the closing brace) → one Export node per statement (name =
      comma-joined list) + EXPORTS(file → same-file entity) per resolved
      name; `export default NAME;` → Export node named 'default' +
      EXPORTS when NAME resolves; inline `export function/class/const`
      marks the entity exported (EXPORTS triple, no separate node)
      (enhanced-ast-parser.ts:470-546).
  E8b. named re-export: `export { a, b as c } from 'spec'` (the
      from-clause must end on the closing-brace line; list may span
      lines like E8) → one Export node per statement (name =
      comma-joined EXPORTED names — the reference marks these
      isReExport with sourceModule, enhanced-ast-parser.ts:475-494).
      Names are NOT resolved same-file and emit NO EXPORTS triple
      (there is no same-file entity); instead the statement records
      re-export pairs (exported_name ← source_name, spec) consumed by
      L1b. The statement emits no IMPORTS triple (reference parity:
      processExportDeclaration creates no IMPORTS edge).
  E8c. star re-export: `export * from 'spec'` → NO entity (the
      reference's NamedExports-only branch skips it,
      enhanced-ast-parser.ts:475) but records a star re-export
      (every symbol of the resolved target, L1b). `export * as ns
      from` is out of spec (skipped). External (bare) specs record
      nothing resolvable — consumers dangle as no-such-symbol.
  E9. every non-File entity → DEFINED_IN(entity → file)
      (ast-parser.ts:354-368).

Call extraction (ast-parser.ts:374-396 — same-file, by name):
  C1. each line is attributed to the INNERMOST function-like entity
      (Function/ArrowFunction/Method/TestCase) whose [start,end] covers
      it; unattributed lines emit no calls.
  C2. call sites: NAME( not preceded by [letter, digit, _, $, ., @]
      (dotted calls excluded — callee text 'x.y' can never equal a
      same-file function name in the reference either; '@' excludes
      decorator invocations), NAME not in the control-keyword set; a
      match of the entity's own name on its own declaration line is the
      definition, not a call.
  C3. resolution: same-file function-like with that name (first by
      start_line) → CALLS(caller → callee); else a local name imported
      from ANY module (internal or external) → mention(kind='call') for
      the linking shuffle — external specifiers resolve to nothing
      there and land in the dangling report (no-such-module), matching
      J7; else dangling.
  C2b. namespace-member calls: `NS.member(` where NS is a namespace
      import local (`import * as NS from 'spec'`) and NS is not
      preceded by [letter, digit, _, $, ., @] → mention(kind='call',
      module=spec, symbol=member) attributed like C1; col = position
      of NS (the reference records the call expression start,
      enhanced-ast-parser.ts:577-604, and takes the PROPERTY name as
      the callee, :582-585 — resolution through the IMPORTS edge is
      the latent stage we implement). Only direct two-part member
      calls (`a.b.c(` emits nothing); non-namespace locals keep the
      dotted-call exclusion of C2.

Variable accesses (SPEC v3 — enhanced-ast-parser.ts:558-628: the
reference walks every node of every function body and emits a READS or
WRITES edge per ts.Identifier, targeting the placeholder variable
business key `{fileId}#{name}#{line}`):
  R1. Lines attributed to an innermost function-like owner (the C1
      walk) are scanned for identifier accesses in the scan view. On
      the owner's start_line only text after the body opener
      participates (the reference walks the BODY node only — params /
      return types are siblings): for Function/Method/TestCase, after
      the first '{' at/after the declaration (brace view; none on the
      line → nothing participates); for ArrowFunction, after the first
      '=>'. All other covered lines participate fully.
  R2. An access is a maximal identifier token NAME not preceded by
      [\w$@] ('.'-preceded property names DO count — the walker visits
      every ts.Identifier including PropertyAccess names) and not in
      RW_KEYWORDS (functions/rules.py — keywords/TS-primitive-type
      tokens are never ts.Identifier nodes; documented deviation:
      `undefined` is excluded though the TS AST calls it an Identifier).
  R3. Classification (isWriteAccess, enhanced-ast-parser.ts:676-691 —
      ONLY plain `=` assignment and ++/--; `+=` etc. fall through to
      READ, a reference quirk kept): WRITES iff, within the same
      physical line, (a) the nearest non-space text after the token
      starts `++`/`--`, or the two chars ending at the nearest
      non-space char before it are `++`/`--`; or (b) the nearest
      non-space char after is `=` not followed by `=`/`>`, AND the
      nearest non-space char before is not '.' or ':' (property /
      type-annotation position — their parent is never the
      BinaryExpression), AND the word immediately before is not
      const/let/var (a declaration initializer's parent is a
      VariableDeclaration → READ in the reference). Else READS.
      Documented deviations (golden and engine agree with each other):
      second declarators (`let a = 1, b = 2` → b WRITES) and
      destructuring defaults classify as WRITES.
  R4. Triple (owner_eid, READS|WRITES, "{fid}#{name}#{line}") with the
      1-based access line and 0-based token col. The target is the
      reference's PLACEHOLDER key (BusinessKeyGenerator.variable,
      enhanced-graph.ts:224-226) — not a resolved node, so no linking
      shuffle (same-file by construction) and no Variable node is
      required to exist.
  C4. Every CALLS triple carries ``dynamic`` = (callee ∈ {require,
      import}) per isDynamicCall (enhanced-ast-parser.ts:663-669,
      stamped at :602). `import(` is keyword-excluded as a call site
      (C2), so a dynamic CALLS arises only via a function actually
      named `require`. Non-CALLS triples carry null. ``props_json``
      mirrors graph_edges.properties — the reference never populates
      it for AST edges, so it rides as null through the pipeline.

JSX (SPEC P8 — `.tsx`/`.jsx` files only; the reference passes the
file PATH to ts.createSourceFile, enhanced-ast-parser.ts:53-58, so
ScriptKind is inferred from the extension and JSX parses; its visitor
only reacts to CallExpression-and-friends, so JSX syntax itself emits
nothing — calls count only inside expression containers):
  P8. In the P0 lexer a `<` at EXPRESSION POSITION followed by an
      ASCII letter, `_`, `$` or `>` (fragment) opens a JSX element.
      Expression position: the significant scan text so far (masked
      chars are blank; a completed JSX element reads as a value)
      rstripped either is empty, ends with one of `( [ { , ; = ? : &
      | !`, ends with `=>`, or ends with a word in {return case do
      else typeof await yield in of}. Otherwise `<` is an operator /
      generic and JSX lexing does not engage (TS itself requires
      `<T,>` for generic arrows in .tsx — bare `<T>(…)=>` at
      expression position is out of spec).
      Inside JSX, ALL of tag syntax (names, attribute names, `<` `>`
      `</name>` `/>`), quoted attribute values (no backslash escapes,
      HTML-style; may span lines) and JSX text are masked in BOTH
      views. `{…}` expression containers re-enter full JS lexing
      (comments, strings, templates, nested JSX elements, real JS
      braces tracked so the container's own closing brace is found at
      depth 0); the container's OWN braces are masked in both views
      (JSX punctuation, not block braces) and the container opens at
      expression position. `{/* … */}` is therefore an ordinary
      (masked) comment. Elements nest; closing a tag returns to the
      enclosing text / container / statement. Unterminated JSX masks
      to EOF. Line structure is preserved throughout. Files without
      the extension are lexed exactly as before (P0), so `<` stays an
      operator there.

Cross-file linking (the latent J4 stage — enhanced-ast-parser.ts:588-604
leaves keys '{fileId}#{name}#unknown'; we resolve them):
  L1. definitions: per (repo, module_path, symbol) exported from the
      max-commit version of that path → entity_id. A symbol='' row maps
      the module path itself to its file_id (for IMPORTS).
  L1b. re-export chains: when (repo, module, symbol) has no direct
      definition, follow the latest version's re-export records
      breadth-first — named pairs route symbol → (target, source);
      star routes symbol → (target, symbol). Specs resolve like E7
      (resolve_module against the repo path set; unresolvable specs
      contribute nothing). SHALLOWEST chain wins; among equal-depth
      hits the tie-break is (statement line of the LAST edge, then
      entity id ascending). Depth-capped at 8 hops; cycles are
      visited-set guarded. Local definitions always shadow (direct
      hit short-circuits at depth 0). A symbol a star target exports
      under its declared name is re-exported under that name (our
      spec keys definitions by declared name — the ES 'default'
      nuance does not arise, see L1).
  L2. mention kind='call' + function-like definition → CALLS(src →
      def); if the caller is a TestCase also TESTED_BY(def → caller).
  L3. kind='extends' → EXTENDS(src → def); kind='implements' →
      IMPLEMENTS(src → def).
  L4. unresolved mentions → dangling report (dropped from triples).
=======================================================================
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pyarrow as pa

from .ids import commit_id, entity_id, file_id, repo_id, sha256_hex
from .functions.rules import (
    DYNAMIC_CALLEES,
    MAX_FILE_BYTES,
    PARSED_LANGS,
    RW_KEYWORDS,
    detect_language,
    is_test_path,
    resolve_module,
)

NAME = r"[^\W\d][\w$]*"
FUNC_RE = re.compile(
    rf"^(\s*)(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s+({NAME})\s*\(", re.U
)
ARROW_RE = re.compile(
    rf"^(\s*)(?:export\s+)?(?:const|let|var)\s+({NAME})\s*=\s*(?:async\s*)?\([^)]*\)\s*(:[^=]+)?=>",
    re.U,
)
VAR_RE = re.compile(
    rf"^(\s*)(?:export\s+)?(const|let|var)\s+({NAME})\s*=\s*(.+)$", re.U
)
CLASS_RE = re.compile(
    rf"^(\s*)(?:export\s+)?(?:default\s+)?(?:abstract\s+)?class\s+({NAME})"
    rf"(?:\s+extends\s+([\w$.]+))?(?:\s+implements\s+([\w$,\s]+?))?\s*\{{",
    re.U,
)
IFACE_RE = re.compile(rf"^(\s*)(?:export\s+)?interface\s+({NAME})", re.U)
METHOD_RE = re.compile(
    rf"^(\s*)(?:(?:public|private|protected|static|async|get|set)\s+)*({NAME})\s*\([^)]*\)\s*\{{",
    re.U,
)
IMPORT_RE = re.compile(r"^(\s*)import\s+(?:(.+?)\s+from\s+)?['\"]([^'\"]+)['\"]", re.U)
IMPORT_START_RE = re.compile(r"^(\s*)import\b", re.U)
EXPORT_LIST_RE = re.compile(r"^(\s*)export\s+\{([^}]*)\}", re.U)
EXPORT_LIST_START_RE = re.compile(r"^(\s*)export\s+\{", re.U)
EXPORT_FROM_RE = re.compile(
    r"^(\s*)export\s+\{([^}]*)\}\s*from\s*['\"]([^'\"]+)['\"]", re.U
)
EXPORT_STAR_RE = re.compile(
    r"^(\s*)export\s+\*\s+from\s+['\"]([^'\"]+)['\"]", re.U
)
EXPORT_DEFAULT_RE = re.compile(rf"^(\s*)export\s+default\s+({NAME})\s*;?\s*$", re.U)
DECORATOR_RE = re.compile(rf"^(\s*)@({NAME})", re.U)
CALL_RE = re.compile(rf"(?<![\w$.@])({NAME})\s*\(", re.U)
MEMBER_CALL_RE = re.compile(rf"(?<![\w$.@])({NAME})\.({NAME})\s*\(", re.U)
# SPEC v3 R2: '.' deliberately absent from the lookbehind — property
# names are ts.Identifiers and emit accesses too
IDENT_RE = re.compile(rf"(?<![\w$@])({NAME})", re.U)
MAX_REEXPORT_DEPTH = 8  # L1b chain hop cap (cycle-safe either way)
MAX_JOIN = 20  # bound on physical lines joined into one logical statement

CALL_KEYWORDS = frozenset(
    "if for while switch catch function return new typeof await else do "
    "import export async const let var super this constructor".split()
)
METHOD_NOT = frozenset("if for while switch catch function return constructor_ok".split()) - {"constructor_ok"}
FUNCTION_LIKE = frozenset(["Function", "ArrowFunction", "Method", "TestCase"])


@dataclass
class Entity:
    kind: str
    name: str
    start_line: int
    start_col: int
    end_line: int
    signature: str
    eid: str = ""
    exported: bool = False
    props: dict = field(default_factory=dict)


def _norm_jsdoc(raw: str) -> str:
    """SPEC P7: JSDoc text — between ``/**`` and ``*/``, leading ``*``
    (+ one space) stripped per line, trimmed (ts jsDoc[0].comment,
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


_EXPR_KEYWORDS = frozenset("return case do else typeof await yield in of".split())
_EXPR_TAIL_RE = re.compile(r"([A-Za-z_$][\w$]*)$")


def _expr_pos(sig: str) -> bool:
    """SPEC P8: would a `<` here be at expression position? ``sig`` is
    the significant scan text emitted so far (tail suffices; masked
    chars are spaces, a finished JSX element appears as `X`)."""
    t = sig.rstrip()
    if not t:
        return True
    if t.endswith("=>"):
        return True
    if t[-1] in "([{,;=?:&|!":
        return True
    m = _EXPR_TAIL_RE.search(t)
    return bool(m) and m.group(1) in _EXPR_KEYWORDS


def preprocess(
    content: str, jsx: bool = False
) -> tuple[list[str], list[str], dict[int, tuple[int, str]]]:
    """P0/P8 lexer (slow, obviously-correct per-char state machine).

    Returns (scan_lines, brace_lines, jsdocs): comments and
    template-literal contents masked in both views; quoted-string
    contents masked only in the brace view. Line structure is preserved
    exactly. ``jsdocs`` maps a JSDoc block's 0-based end line to
    (start line, normalized text) — SPEC P7. With ``jsx`` (P8,
    .tsx/.jsx files) JSX tags/text/attribute-strings are masked in
    BOTH views and `{…}` expression containers re-enter JS lexing."""
    CODE, SQ, DQ, TPL, LINEC, BLOCKC, JSXTAG, JSXTEXT = range(8)
    state = CODE
    block_start = -1
    jsdoc_spans: list[tuple[int, int]] = []
    scan: list[str] = []
    brace: list[str] = []
    # P8 state: stack frames are ["elem"] (an open element whose text we
    # are in) or ["expr", ret_state, js_brace_depth] (an expression
    # container). ``sig`` mirrors the scan view's significant tail for
    # the expression-position test.
    jstack: list[list] = []
    sig = ""

    def _emit(s: str, b: str) -> None:
        nonlocal sig
        scan.append(s)
        brace.append(b)
        sig += s
        if len(sig) > 160:
            sig = sig[-80:]

    def _elem_done() -> int:
        """A JSX element just closed: resume enclosing context."""
        nonlocal sig
        if jstack and jstack[-1][0] == "elem":
            return JSXTEXT
        sig += " X"  # the element reads as a value in CODE
        return CODE

    i, n = 0, len(content)
    while i < n:
        ch = content[i]
        if ch == "\n":
            if state in (SQ, DQ, LINEC):  # strings/line comments end at EOL
                state = CODE
            _emit("\n", "\n")
            i += 1
            continue
        if state == CODE:
            nxt = content[i + 1] if i + 1 < n else ""
            if ch == "/" and nxt == "/":
                state = LINEC
                _emit("  ", "  ")
                i += 2
                continue
            if ch == "/" and nxt == "*":
                state = BLOCKC
                block_start = i
                _emit("  ", "  ")
                i += 2
                continue
            if (
                jsx
                and ch == "<"
                and (nxt in ">_$" or "a" <= nxt <= "z" or "A" <= nxt <= "Z")
                and _expr_pos(sig)
            ):
                state = JSXTAG
                _emit(" ", " ")
                i += 1
                continue
            if jsx and jstack and jstack[-1][0] == "expr":
                if ch == "{":
                    jstack[-1][2] += 1
                elif ch == "}":
                    if jstack[-1][2] == 0:  # container closes
                        frame = jstack.pop()
                        state = frame[1]
                        _emit(" ", " ")
                        i += 1
                        continue
                    jstack[-1][2] -= 1
            if ch == "'":
                state = SQ
            elif ch == '"':
                state = DQ
            elif ch == "`":
                state = TPL
            _emit(ch, ch)
            i += 1
            continue
        if state == JSXTAG:
            nxt = content[i + 1] if i + 1 < n else ""
            if ch in "'\"":  # attribute value: mask to the matching quote
                _emit(" ", " ")
                i += 1
                while i < n and content[i] != ch:
                    _emit("\n" if content[i] == "\n" else " ",
                          "\n" if content[i] == "\n" else " ")
                    i += 1
                if i < n:
                    _emit(" ", " ")
                    i += 1
                continue
            if ch == "{":
                jstack.append(["expr", JSXTAG, 0])
                state = CODE
                _emit(" ", " ")
                sig += " ("  # container opens at expression position
                i += 1
                continue
            if ch == "/" and nxt == ">":  # self-closing
                _emit("  ", "  ")
                i += 2
                state = _elem_done()
                continue
            if ch == ">":
                jstack.append(["elem"])
                state = JSXTEXT
                _emit(" ", " ")
                i += 1
                continue
            _emit(" ", " ")
            i += 1
            continue
        if state == JSXTEXT:
            nxt = content[i + 1] if i + 1 < n else ""
            if ch == "{":
                jstack.append(["expr", JSXTEXT, 0])
                state = CODE
                _emit(" ", " ")
                sig += " ("
                i += 1
                continue
            if ch == "<" and nxt == "/":  # closing tag: mask `</name>`
                while i < n and content[i] != ">":
                    _emit("\n" if content[i] == "\n" else " ",
                          "\n" if content[i] == "\n" else " ")
                    i += 1
                if i < n:
                    _emit(" ", " ")
                    i += 1
                if jstack and jstack[-1][0] == "elem":
                    jstack.pop()
                state = _elem_done()
                continue
            if ch == "<":
                state = JSXTAG
                _emit(" ", " ")
                i += 1
                continue
            _emit(" ", " ")
            i += 1
            continue
        if state in (SQ, DQ):
            quote = "'" if state == SQ else '"'
            if ch == "\\" and i + 1 < n and content[i + 1] != "\n":
                _emit(content[i : i + 2], "  ")
                i += 2
                continue
            if ch == quote:
                state = CODE
                _emit(ch, ch)
            else:
                _emit(ch, " ")
            i += 1
            continue
        if state == TPL:
            if ch == "\\" and i + 1 < n and content[i + 1] != "\n":
                _emit("  ", "  ")
                i += 2
                continue
            if ch == "`":
                state = CODE
                _emit(ch, ch)
            else:
                _emit(" ", " ")
            i += 1
            continue
        if state == LINEC:
            _emit(" ", " ")
            i += 1
            continue
        # BLOCKC
        if ch == "*" and i + 1 < n and content[i + 1] == "/":
            state = CODE
            if content.startswith("/**", block_start) and i + 2 - block_start > 4:
                jsdoc_spans.append((block_start, i + 2))
            _emit("  ", "  ")
            i += 2
            continue
        _emit(" ", " ")
        i += 1
    jsdocs: dict[int, tuple[int, str]] = {}
    for a, b in jsdoc_spans:
        start_line = content.count("\n", 0, a)
        end_line = content.count("\n", 0, b)
        jsdocs[end_line] = (start_line, _norm_jsdoc(content[a:b]))
    return "".join(scan).split("\n"), "".join(brace).split("\n"), jsdocs


def _classify_access(line: str, start: int, end: int) -> str:
    """SPEC v3 R3 classifier (slow, obviously-correct char peeks; the
    engine's regex twin is property-tested against it)."""
    n = len(line)
    j = end
    while j < n and line[j] == " ":
        j += 1
    if line[j : j + 2] in ("++", "--"):
        return "WRITES"
    k = start - 1
    while k >= 0 and line[k] == " ":
        k -= 1
    if k >= 1 and line[k - 1 : k + 1] in ("++", "--"):
        return "WRITES"
    if j < n and line[j] == "=" and line[j + 1 : j + 2] not in ("=", ">"):
        if k >= 0 and line[k] in ".:":
            return "READS"
        seg = line[:start].rstrip(" ")
        for kw in ("const", "let", "var"):
            if seg.endswith(kw):
                pre = seg[: -len(kw)]
                if not pre or not (pre[-1].isalnum() or pre[-1] in "_$"):
                    return "READS"
        return "WRITES"
    return "READS"


def _join_stmt(lines: list[str], idx: int, done) -> tuple[str, int]:
    """Join physical lines starting at idx into one logical statement
    until ``done(text)``; returns (text, n_lines). Bounded by MAX_JOIN."""
    buf = lines[idx]
    n = 1
    while not done(buf) and n < MAX_JOIN and idx + n < len(lines):
        buf = buf + " " + lines[idx + n].strip()
        n += 1
    return buf, n


def _brace_end(lines: list[str], start_idx: int) -> int:
    """Line index (0-based) of the closing brace matching the first '{'
    at/after lines[start_idx]. Naive char counting, depth clamped ≥ 0."""
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


def parse_file(repo: str, path: str, commit: str, content: str):
    """Parse one file → (entities, local_triples, mentions, import_map).

    local_triples: (subj, pred, obj, line, col); mentions:
    dicts with keys repo/module/symbol/kind/src_id/src_kind/src_file/line/col.
    """
    fid = file_id(repo, commit, path)
    lines, brace_lines, jsdocs = preprocess(
        content, jsx=path.endswith((".tsx", ".jsx"))  # SPEC P8
    )
    test_file = is_test_path(path)
    entities: list[Entity] = []
    mentions: list[dict] = []
    triples: list[tuple] = []
    import_map: dict[str, str] = {}  # local name -> spec
    ns_map: dict[str, str] = {}  # namespace-import local -> spec (C2b)
    import_specs: list[tuple[str, int, int]] = []  # (spec, line, col)
    export_names: list[tuple[str, int, int, bool]] = []  # (name, line, col, is_default)
    inline_exported: set[str] = set()
    # E8b/E8c: (spec, {exported: source} | '*', stmt_line)
    reexports: list[tuple] = []
    pending_dec: list[str] = []

    def _attach_dec(e: Entity):
        if pending_dec:
            e.props["decorators"] = list(pending_dec)
            pending_dec.clear()

    # ---- pass 1: line scan with module-scope depth tracking
    depth = 0
    idx = 0
    while idx < len(lines):
        line = lines[idx]
        lineno = idx + 1
        consumed = 1
        md = DECORATOR_RE.match(line)
        if md:
            pending_dec.append(md.group(2))
            depth = _depth_after(depth, brace_lines[idx])
            idx += 1
            continue
        if line.strip() == "":  # blank keeps a pending decorator queue
            depth = _depth_after(depth, brace_lines[idx])
            idx += 1
            continue
        m = IMPORT_RE.match(line)
        if m is None and IMPORT_START_RE.match(line):
            # multi-line import clause (E7): join until the spec appears
            joined, njoin = _join_stmt(lines, idx, lambda s: IMPORT_RE.match(s))
            m = IMPORT_RE.match(joined)
            if m:
                line, consumed = joined, njoin
        if m:
            pending_dec.clear()
            indent, clause, spec = m.group(1), m.group(2), m.group(3)
            col = len(indent)
            e = Entity("Import", spec, lineno, col, lineno + consumed - 1,
                       line.strip().rstrip(";"))
            e.eid = entity_id(fid, "Import", spec, lineno, col)
            entities.append(e)
            import_specs.append((spec, lineno, col))
            if clause:
                for part in _import_locals(clause):
                    import_map[part] = spec
                for part in _import_ns_locals(clause):
                    ns_map[part] = spec
            for k in range(idx, idx + consumed):
                depth = _depth_after(depth, brace_lines[k])
            idx += consumed
            continue
        m = EXPORT_LIST_RE.match(line)
        if m is None and EXPORT_LIST_START_RE.match(line):
            joined, njoin = _join_stmt(lines, idx, lambda s: "}" in s)
            m = EXPORT_LIST_RE.match(joined)
            if m:
                line, consumed = joined, njoin
        if m:
            pending_dec.clear()
            col = len(m.group(1))
            mf = EXPORT_FROM_RE.match(line)
            if mf:
                # E8b: names are re-export pairs, never same-file
                pairs: dict[str, str] = {}
                for part in mf.group(2).split(","):
                    part = part.strip()
                    if not part:
                        continue
                    bits = [b.strip() for b in part.split(" as ")]
                    pairs[bits[-1]] = bits[0]
                joined_names = ",".join(pairs)
                e = Entity("Export", joined_names, lineno, col,
                           lineno + consumed - 1, line.strip().rstrip(";"))
                e.eid = entity_id(fid, "Export", joined_names, lineno, col)
                entities.append(e)
                reexports.append((mf.group(3), pairs, lineno))
            else:
                names = [n.strip().split(" as ")[-1].strip() for n in m.group(2).split(",") if n.strip()]
                joined_names = ",".join(names)
                e = Entity("Export", joined_names, lineno, col, lineno + consumed - 1,
                           line.strip().rstrip(";"))
                e.eid = entity_id(fid, "Export", joined_names, lineno, col)
                entities.append(e)
                for n in names:
                    export_names.append((n, lineno, col, False))
            for k in range(idx, idx + consumed):
                depth = _depth_after(depth, brace_lines[k])
            idx += consumed
            continue
        m = EXPORT_STAR_RE.match(line)
        if m:
            pending_dec.clear()
            reexports.append((m.group(2), "*", lineno))  # E8c: no entity
            depth = _depth_after(depth, brace_lines[idx])
            idx += 1
            continue
        m = EXPORT_DEFAULT_RE.match(line)
        if m:
            pending_dec.clear()
            col = len(m.group(1))
            e = Entity("Export", "default", lineno, col, lineno, line.strip().rstrip(";"))
            e.eid = entity_id(fid, "Export", "default", lineno, col)
            entities.append(e)
            export_names.append((m.group(2), lineno, col, True))
            depth = _depth_after(depth, brace_lines[idx])
            idx += 1
            continue
        m = FUNC_RE.match(line)
        if m:
            name = m.group(2)
            col = len(m.group(1))
            kind = "TestCase" if test_file else "Function"
            end = _brace_end(brace_lines, idx) + 1
            sig = _sig_before(line, col, "{")
            e = Entity(kind, name, lineno, col, end, sig)
            e.eid = entity_id(fid, kind, name, lineno, col)
            e.exported = "export" in line[:col] or line[col:].startswith("export")
            _attach_dec(e)
            entities.append(e)
            if e.exported:
                inline_exported.add(name)
            depth = _depth_after(depth, brace_lines[idx])
            idx += 1
            continue
        m = ARROW_RE.match(line)
        if m:
            name = m.group(2)
            col = len(m.group(1))
            if "{" in brace_lines[idx].split("=>", 1)[-1]:
                end = _brace_end(brace_lines, idx) + 1
            else:
                end = lineno
            sig = _sig_before(line, col, "=>").rstrip()
            e = Entity("ArrowFunction", name, lineno, col, end, sig)
            e.eid = entity_id(fid, "ArrowFunction", name, lineno, col)
            e.exported = line[col:].startswith("export")
            _attach_dec(e)
            entities.append(e)
            if e.exported:
                inline_exported.add(name)
            depth = _depth_after(depth, brace_lines[idx])
            idx += 1
            continue
        m = CLASS_RE.match(line)
        if m:
            indent, name, ext, impl = m.group(1), m.group(2), m.group(3), m.group(4)
            col = len(indent)
            end = _brace_end(brace_lines, idx) + 1
            sig = _sig_before(line, col, "{")
            e = Entity("Class", name, lineno, col, end, sig)
            e.eid = entity_id(fid, "Class", name, lineno, col)
            e.exported = line[col:].startswith("export")
            e.props = {"extends": ext or "", "implements": impl or ""}
            _attach_dec(e)
            entities.append(e)
            if e.exported:
                inline_exported.add(name)
            depth = _depth_after(depth, brace_lines[idx])
            idx += 1
            continue
        m = IFACE_RE.match(line)
        if m:
            name = m.group(2)
            col = len(m.group(1))
            end = _brace_end(brace_lines, idx) + 1
            e = Entity("Interface", name, lineno, col, end, _sig_before(line, col, "{"))
            e.eid = entity_id(fid, "Interface", name, lineno, col)
            e.exported = line[col:].startswith("export")
            _attach_dec(e)
            entities.append(e)
            if e.exported:
                inline_exported.add(name)
            depth = _depth_after(depth, brace_lines[idx])
            idx += 1
            continue
        m = VAR_RE.match(line)
        if m and depth == 0:
            indent, vkind, name, value = m.groups()
            col = len(indent)
            e = Entity(
                "Variable", name, lineno, col, lineno, line.strip().rstrip(";")
            )
            e.eid = entity_id(fid, "Variable", name, lineno, col)
            e.exported = line[col:].startswith("export")
            e.props = {"kind": vkind, "value_snippet": value.rstrip(";").strip()[:100]}
            _attach_dec(e)
            entities.append(e)
            if e.exported:
                inline_exported.add(name)
            depth = _depth_after(depth, brace_lines[idx])
            idx += 1
            continue
        pending_dec.clear()
        depth = _depth_after(depth, brace_lines[idx])
        idx += 1

    # ---- pass 2: methods inside classes
    classes = [e for e in entities if e.kind == "Class"]
    for cls in classes:
        for idx in range(cls.start_line, cls.end_line - 1):  # body lines after decl
            line = lines[idx]
            m = METHOD_RE.match(line)
            if not m:
                continue
            name = m.group(2)
            if name in ("if", "for", "while", "switch", "catch", "function", "return"):
                continue
            indent = len(m.group(1))
            if indent <= cls.start_col:
                continue
            # directly inside the class (not nested in a method body)
            if any(
                e.kind == "Method"
                and e.start_line <= idx + 1 <= e.end_line
                and e.start_line < idx + 1
                for e in entities
            ):
                continue
            lineno = idx + 1
            end = _brace_end(brace_lines, idx) + 1
            e = Entity("Method", name, lineno, indent, end, _sig_before(line, indent, "{"))
            e.eid = entity_id(fid, "Method", name, lineno, indent)
            # method decorators: immediately preceding decorator/blank lines
            decs: list[str] = []
            back = idx - 1
            while back >= 0:
                mdd = DECORATOR_RE.match(lines[back])
                if mdd:
                    decs.insert(0, mdd.group(2))
                    back -= 1
                    continue
                if lines[back].strip() == "":
                    back -= 1
                    continue
                break
            if decs:
                e.props["decorators"] = decs
            entities.append(e)
            triples.append((cls.eid, "CONTAINS", e.eid, lineno, indent))

    # ---- DEFINED_IN for every entity
    for e in entities:
        triples.append((e.eid, "DEFINED_IN", fid, e.start_line, e.start_col))

    # ---- EXTENDS / IMPLEMENTS
    by_name: dict[str, Entity] = {}
    for e in sorted(entities, key=lambda x: x.start_line):
        by_name.setdefault((e.kind, e.name), e)
    def _resolve_type(name: str):
        for kind in ("Class", "Interface"):
            e = by_name.get((kind, name))
            if e:
                return e
        return None

    for cls in classes:
        ext = cls.props.get("extends", "")
        if ext:
            tgt = _resolve_type(ext)
            if tgt is not None:
                triples.append((cls.eid, "EXTENDS", tgt.eid, cls.start_line, cls.start_col))
            elif ext in import_map:
                mentions.append(_mention(repo, import_map[ext], ext, "extends", cls, path))
        impl = cls.props.get("implements", "")
        if impl:
            for nm in [x.strip() for x in impl.split(",") if x.strip()]:
                tgt = _resolve_type(nm)
                if tgt is not None:
                    triples.append((cls.eid, "IMPLEMENTS", tgt.eid, cls.start_line, cls.start_col))
                elif nm in import_map:
                    mentions.append(_mention(repo, import_map[nm], nm, "implements", cls, path))

    # ---- EXPORTS triples
    def _resolve_any(name: str):
        for kind in ("Function", "TestCase", "ArrowFunction", "Class", "Interface", "Variable", "Method"):
            e = by_name.get((kind, name))
            if e:
                return e
        return None

    exported_syms: dict[str, Entity] = {}
    for name, lineno, col, _is_default in export_names:
        tgt = _resolve_any(name)
        if tgt is not None:
            triples.append((fid, "EXPORTS", tgt.eid, lineno, col))
            exported_syms[name] = tgt
    for name in inline_exported:
        tgt = _resolve_any(name)
        if tgt is not None:
            triples.append((fid, "EXPORTS", tgt.eid, tgt.start_line, tgt.start_col))
            exported_syms[name] = tgt

    # ---- calls: innermost function-like attribution per line
    funclike = sorted(
        (e for e in entities if e.kind in FUNCTION_LIKE), key=lambda e: e.start_line
    )
    fl_by_name: dict[str, Entity] = {}
    for e in funclike:
        fl_by_name.setdefault(e.name, e)
    for idx, line in enumerate(lines):
        lineno = idx + 1
        owner = None
        for e in funclike:
            if e.start_line <= lineno <= e.end_line:
                if owner is None or e.start_line >= owner.start_line:
                    owner = e
        if owner is None:
            continue
        for m in CALL_RE.finditer(line):
            callee = m.group(1)
            if callee in CALL_KEYWORDS:
                continue
            if lineno == owner.start_line and callee == owner.name:
                continue  # own definition, not a call
            tgt = fl_by_name.get(callee)
            if tgt is not None:
                # 6th element = SPEC C4 dynamic flag (CALLS tuples only)
                triples.append((owner.eid, "CALLS", tgt.eid, lineno,
                                m.start(1), callee in DYNAMIC_CALLEES))
            elif callee in import_map:
                # external (bare) specifiers also become mentions — the
                # linking stage resolves them to nothing and they land
                # in the J7 dangling report (no-such-module)
                mentions.append(
                    _mention(repo, import_map[callee], callee, "call", owner,
                             path, lineno, m.start(1))
                )
            # unresolved: dangling
        if ns_map:
            # C2b: NS.member( through a namespace import
            for m in MEMBER_CALL_RE.finditer(line):
                spec = ns_map.get(m.group(1))
                if spec is None:
                    continue
                mentions.append(
                    _mention(repo, spec, m.group(2), "call", owner,
                             path, lineno, m.start(1))
                )
        # SPEC v3 R1-R4: variable-access edges for every identifier in
        # the owner's body on this line
        if lineno == owner.start_line:
            bl = brace_lines[idx]
            if owner.kind == "ArrowFunction":
                p = bl.find("=>")
                boff = p + 2 if p >= 0 else len(line)
            else:
                p = bl.find("{")
                boff = p + 1 if p >= 0 else len(line)
        else:
            boff = 0
        for m in IDENT_RE.finditer(line, boff):
            nm = m.group(1)
            if nm in RW_KEYWORDS:
                continue
            acc = _classify_access(line, m.start(1), m.end(1))
            triples.append(
                (owner.eid, acc, f"{fid}#{nm}#{lineno}", lineno, m.start(1))
            )

    # ---- IMPORTS mentions (resolved to file targets in linking)
    for spec, lineno, col in import_specs:
        if spec.startswith("."):
            mentions.append(
                {
                    "repo": repo,
                    "module": spec,  # raw; resolved against repo path set later
                    "symbol": "",
                    "kind": "import",
                    "src_id": fid,
                    "src_kind": "File",
                    "src_file": path,
                    "line": lineno,
                    "col": col,
                }
            )
        else:
            triples.append((fid, "IMPORTS", f"module:{spec}", lineno, col))

    # SPEC P7: attach the TOPMOST JSDoc of each declaration's
    # leading-trivia run (blank / decorator / comment-interior lines),
    # matching ts jsDoc[0] (enhanced-ast-parser.ts:143,206,260).
    if jsdocs:
        for e in entities:
            b = e.start_line - 2  # 0-based line above the declaration
            found = ""
            while b >= 0:
                j = jsdocs.get(b)
                if j is not None:
                    found = j[1]
                    b = j[0] - 1
                    continue
                if lines[b].strip() == "" or DECORATOR_RE.match(lines[b]):
                    b -= 1
                    continue
                break
            if found:
                e.props["docstring"] = found

    return entities, triples, mentions, exported_syms, reexports


def _mention(repo, spec, symbol, kind, src: Entity, src_file, line=None, col=None):
    return {
        "repo": repo,
        "module": spec,
        "symbol": symbol,
        "kind": kind,
        "src_id": src.eid,
        "src_kind": src.kind,
        "src_file": src_file,
        "line": line if line is not None else src.start_line,
        "col": col if col is not None else src.start_col,
    }


def _import_ns_locals(clause: str) -> list[str]:
    """Namespace locals only (`* as X`) — the subset of _import_locals
    that C2b member-call resolution applies to."""
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


def _depth_after(depth: int, line: str) -> int:
    for ch in line:
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth = max(0, depth - 1)
    return depth


def _sig_before(line: str, col: int, stop: str) -> str:
    seg = line[col:]
    i = seg.find(stop)
    return (seg[:i] if i >= 0 else seg).rstrip()


# ------------------------------------------------------------------ corpus-level

def golden_extract(corpus: pa.Table):
    """Run the full oracle over a corpus table → (nodes, triples) where
    nodes is a list of dicts and triples a set of (subj, pred, obj)."""
    rows = corpus.to_pylist()
    nodes: list[dict] = []
    triples: set[tuple] = set()
    mentions: list[dict] = []
    # repo → path set; (repo, path) → max commit
    repo_paths: dict[str, set[str]] = {}
    latest: dict[tuple[str, str], str] = {}
    for r in rows:
        if len(r["content"].encode("utf-8", "surrogatepass")) > MAX_FILE_BYTES:
            continue
        repo_paths.setdefault(r["repo"], set()).add(r["path"])
        key = (r["repo"], r["path"])
        if key not in latest or r["commit"] > latest[key]:
            latest[key] = r["commit"]

    seen_repos: set[str] = set()
    seen_commits: set[tuple[str, str]] = set()
    definitions: dict[tuple[str, str, str], tuple[str, str]] = {}  # (repo,module,symbol) -> (eid, kind)
    # L1b: (repo, path) -> [(spec, {exported: source} | '*', stmt_line)]
    reexports_map: dict[tuple[str, str], list] = {}

    for r in rows:
        repo, path, commit, content = r["repo"], r["path"], r["commit"], r["content"]
        if len(content.encode("utf-8", "surrogatepass")) > MAX_FILE_BYTES:
            continue
        rid = repo_id(repo)
        fid = file_id(repo, commit, path)
        if repo not in seen_repos:
            seen_repos.add(repo)
            nodes.append({"node_id": rid, "node_type": "Repository", "name": repo})
        if (repo, commit) not in seen_commits:
            seen_commits.add((repo, commit))
            cid = commit_id(commit)
            nodes.append({"node_id": cid, "node_type": "Commit", "name": commit})
            triples.add((rid, "HAS_COMMIT", cid))
        nodes.append(
            {
                "node_id": fid,
                "node_type": "File",
                "name": path,
                "content_sha256": sha256_hex(content),
            }
        )
        triples.add((rid, "CONTAINS", fid))
        triples.add((fid, "MODIFIED_IN", commit_id(commit)))
        if detect_language(path) not in PARSED_LANGS:
            continue
        entities, local_triples, file_mentions, exported, file_reex = parse_file(
            repo, path, commit, content
        )
        for e in entities:
            nodes.append(
                {
                    "node_id": e.eid,
                    "node_type": e.kind,
                    "name": e.name,
                    "start_line": e.start_line,
                    "end_line": e.end_line,
                }
            )
        for t in local_triples:
            triples.add((t[0], t[1], t[2]))
        mentions.extend(file_mentions)
        # definitions from the latest version of each path only
        if commit == latest[(repo, path)]:
            definitions[(repo, path, "")] = (fid, "File")
            for name, ent in exported.items():
                definitions[(repo, path, name)] = (ent.eid, ent.kind)
            if file_reex:
                reexports_map[(repo, path)] = file_reex

    # ---- linking
    def _via_reexports(repo: str, module: str, symbol: str):
        """L1b: BFS over re-export records from `module` looking for a
        definition of `symbol`. Shallowest chain wins; equal-depth ties
        break on (line of the last edge, entity id). Depth-capped,
        cycle-guarded. Returns (eid, kind) or None."""
        paths = repo_paths.get(repo, set())
        visited = {(module, symbol)}
        frontier = [(module, symbol)]
        for _ in range(MAX_REEXPORT_DEPTH):
            hits: list[tuple[int, str, str]] = []
            nxt: list[tuple[str, str]] = []
            for mod, sym in frontier:
                for spec, pairs, lineno in reexports_map.get((repo, mod), ()):
                    routed = sym if pairs == "*" else pairs.get(sym)
                    if routed is None:
                        continue
                    target = resolve_module(mod, spec, paths)
                    if not target:
                        continue
                    d = definitions.get((repo, target, routed))
                    if d is not None:
                        hits.append((lineno, d[0], d[1]))
                    if (target, routed) not in visited:
                        visited.add((target, routed))
                        nxt.append((target, routed))
            if hits:
                hits.sort()
                return hits[0][1], hits[0][2]
            if not nxt:
                return None
            frontier = nxt
        return None

    dangling = []
    for m in mentions:
        target = resolve_module(m["src_file"], m["module"], repo_paths.get(m["repo"], set()))
        if not target:
            dangling.append(m)
            continue
        d = definitions.get((m["repo"], target, m["symbol"]))
        if d is None and m["symbol"]:
            d = _via_reexports(m["repo"], target, m["symbol"])
        if d is None:
            dangling.append(m)
            continue
        eid, kind = d
        if m["kind"] == "import":
            triples.add((m["src_id"], "IMPORTS", eid))
        elif m["kind"] == "call":
            if kind in FUNCTION_LIKE:
                triples.add((m["src_id"], "CALLS", eid))
                if m["src_kind"] == "TestCase":
                    triples.add((eid, "TESTED_BY", m["src_id"]))
            else:
                dangling.append(m)
        elif m["kind"] == "extends":
            triples.add((m["src_id"], "EXTENDS", eid))
        elif m["kind"] == "implements":
            triples.add((m["src_id"], "IMPLEMENTS", eid))
    return nodes, triples, dangling


def precision_recall(engine: set[tuple], gold: set[tuple]) -> dict:
    """P/R overall and per predicate over (subj, pred, obj) sets."""
    tp = len(engine & gold)
    p = tp / len(engine) if engine else 1.0
    r = tp / len(gold) if gold else 1.0
    preds = sorted({t[1] for t in gold | engine})
    per = {}
    for pred in preds:
        e = {t for t in engine if t[1] == pred}
        g = {t for t in gold if t[1] == pred}
        tpp = len(e & g)
        per[pred] = {
            "precision": round(tpp / len(e), 4) if e else 1.0,
            "recall": round(tpp / len(g), 4) if g else 1.0,
            "engine": len(e),
            "gold": len(g),
        }
    return {"precision": round(p, 4), "recall": round(r, 4), "engine": len(engine), "gold": len(gold), "per_predicate": per}
