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
