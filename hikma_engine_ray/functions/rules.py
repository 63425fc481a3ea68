"""Scalar classification rules shared by the engine and the golden oracle.

These encode the reference's exact classification semantics:
  - ext → language map           (reference src/modules/ast-parser.ts:115-128,
                                  src/modules/file-scanner.ts:217-227)
  - test-file predicate          (reference src/modules/ast-parser.ts:106-113)
  - file-type classifier         (reference src/modules/ast-parser.ts:300-331,
                                  src/modules/file-scanner.ts:229-246)
  - relative-module resolution   (node-style './x' → '<dir>/x.ts|.js|/index.ts';
                                  the reference leaves specifiers unresolved —
                                  enhanced-ast-parser.ts:452-467 — resolution is
                                  the latent J4 stage this build promotes)
"""

from __future__ import annotations

import posixpath
import re

EXT_LANG = {
    ".ts": "typescript",
    ".tsx": "typescript",
    ".js": "javascript",
    ".jsx": "javascript",
    ".mjs": "javascript",
    ".py": "python",
    ".java": "java",
    ".go": "go",
    ".rs": "rust",
    ".rb": "ruby",
    ".json": "json",
    ".md": "markdown",
    ".yml": "yaml",
    ".yaml": "yaml",
}

PARSED_LANGS = {"typescript", "javascript"}

TEST_RE = re.compile(r"(\.test\.|\.spec\.|__tests__|(^|/)tests?/|(^|/)spec_)")
VENDOR_RE = re.compile(r"(^|/)(node_modules|vendor|dist|build|\.git)(/|$)")
CONFIG_RE = re.compile(
    r"(^|/)(package\.json|tsconfig\.json|jest\.config|\.eslintrc|webpack\.config"
    r"|babel\.config|[^/]*\.ya?ml|\.env[^/]*|Dockerfile[^/]*|docker-compose[^/]*)$"
)
DEV_RE = re.compile(r"(^|/)(scripts|tools|bin)(/|$)")

MAX_FILE_BYTES = 1 << 20  # 1 MiB (reference src/config/index.ts:128)

# SPEC v3 R2 (shared spec DATA — the classifiers live separately in
# golden.py and stages/parser.py): tokens that are never ts.Identifier
# nodes, so a variable-access edge is never emitted for them. Reserved
# words, contextual keywords and TS primitive-type keywords (the
# reference's walker emits READS/WRITES only for ts.isIdentifier nodes,
# enhanced-ast-parser.ts:565-568; keywords/KeywordTypeNodes are distinct
# SyntaxKinds). Documented deviation: `undefined` IS an Identifier in
# the TS AST but is excluded here — a global constant read edge per
# `undefined` mention is graph noise with no linking value.
RW_KEYWORDS = frozenset(
    (
        "await async break case catch class const continue debugger default "
        "delete do else enum export extends false finally for from function "
        "get if implements import in instanceof interface let new null of "
        "package private protected public return set static super switch "
        "this throw true try typeof var void while with yield as satisfies "
        "keyof infer is asserts declare type namespace module readonly "
        "abstract constructor string number boolean object symbol bigint "
        "any unknown never undefined"
    ).split()
)

# SPEC v3 C4: isDynamicCall (enhanced-ast-parser.ts:663-669) — a CALLS
# edge is dynamic iff the callee identifier text is require/import.
DYNAMIC_CALLEES = frozenset(["require", "import"])


def ext_of(path: str) -> str:
    base = posixpath.basename(path)
    i = base.rfind(".")
    return base[i:].lower() if i > 0 else ""


def detect_language(path: str) -> str:
    return EXT_LANG.get(ext_of(path), "unknown")


def is_test_path(path: str) -> bool:
    return bool(TEST_RE.search(path))


def classify_file_type(path: str) -> str:
    """Priority order mirrors reference ast-parser.ts:300-331:
    vendor > test > config > dev > source."""
    if VENDOR_RE.search(path):
        return "vendor"
    if is_test_path(path):
        return "test"
    if CONFIG_RE.search(path):
        return "config"
    if DEV_RE.search(path):
        return "dev"
    return "source"


def resolve_module(importer_path: str, spec: str, repo_paths: set[str]) -> str:
    """Resolve a relative import specifier to a repo file path; '' if
    external / unresolvable. ``repo_paths`` = the set of file paths in
    the repo (any commit)."""
    if not spec.startswith("."):
        return ""
    base = posixpath.normpath(posixpath.join(posixpath.dirname(importer_path), spec))
    for cand in (base, base + ".ts", base + ".tsx", base + ".js", base + ".jsx",
                 base + "/index.ts", base + "/index.js"):
        if cand in repo_paths:
            return cand
    return ""
