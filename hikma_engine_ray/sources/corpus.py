"""Deterministic synthetic source-code corpus generator (FIXTURES.md §1-3).

Produces the exact input table mandated by BASELINE.json's input_hint:
``(repo:string, path:string, commit:string, lang:string,
content:large_string)`` — one row per file-version. Fully seeded; the
same ``(n_files, seed)`` always yields byte-identical content, so the
per-row sha256 invariant and golden triples are stable across runs.

The content templates exercise every extraction rule of the reference
(SURVEY.md §2.2 M5/M6):
  - function declarations + same-file calls   (reference ast-parser.ts:145-233, 374-396)
  - arrow functions named from declarations    (enhanced-ast-parser.ts:167-177)
  - classes w/ extends / implements + methods  (enhanced-ast-parser.ts:284-340)
  - interfaces                                 (ast-parser.ts:235-265)
  - imports incl. a deliberately HOT module    (enhanced-ast-parser.ts:396-468)
    (``src/lib/utils.ts`` imported by ~80% of files → the skewed
    linking key the salted shuffle must handle)
  - exports (named + default)                  (enhanced-ast-parser.ts:470-546)
  - test files → TestCase nodes                (ast-parser.ts:167-172)
  - config / vendor / dev paths → file-type classifier (ast-parser.ts:300-331)
  - adversarial rows: empty content, >1 MiB file (must be size-filtered,
    config/index.ts:128), unicode identifiers, unparseable junk
    (skip-with-warning, ast-parser.ts:80-82)
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pyarrow as pa

from ..schemas import CORPUS

HOT_MODULE = "src/lib/utils.ts"
N_UTILS = 8  # util0..util7 exported by the hot module


def _sha1(s: str) -> str:
    return hashlib.sha1(s.encode()).hexdigest()


def commit_shas(repo: str, n: int = 3) -> list[str]:
    return [_sha1(f"{repo}:{k}") for k in range(n)]


def _utils_content() -> str:
    lines = []
    for i in range(N_UTILS):
        lines.append(f"export function util{i}(x) {{")
        lines.append(f"  return x + {i};")
        lines.append("}")
        lines.append("")
    return "\n".join(lines)


def _module_content(j: int, rng: random.Random, pkg: int, n_mods: int) -> str:
    """One source module. Structure varies by seeded rng but every file
    exercises imports, functions, arrows, classes, interfaces, exports."""
    parts: list[str] = []
    hot = rng.random() < 0.8
    ns_hot = hot and rng.random() < 0.25  # namespace form (SPEC C2b)
    if hot:
        utils = sorted(rng.sample(range(N_UTILS), 2))
        if ns_hot:
            parts.append(f"import * as U_{j} from '../lib/utils';")
        else:
            parts.append(
                f"import {{ util{utils[0]}, util{utils[1]} }} from '../lib/utils';"
            )
    dep = None
    if n_mods > 1 and rng.random() < 0.6:
        dep = rng.randrange(n_mods)
        if dep == j:
            dep = (dep + 1) % n_mods
        dep_pkg = dep % 4
        via_barrel = rng.random() < 0.3  # resolve through pkg barrel (L1b)
        if via_barrel:
            # first_{p} is the barrel's named alias re-export (E8b)
            parts.append(
                f"import {{ f_{dep}_0, first_{dep_pkg} }} from '../pkg{dep_pkg}';"
            )
        else:
            spec = f"./mod_{dep}" if dep_pkg == pkg else f"../pkg{dep_pkg}/mod_{dep}"
            if rng.random() < 0.3:  # multi-line import clause (SPEC E7)
                parts.append("import {")
                parts.append(f"  f_{dep}_0,")
                parts.append(f"}} from '{spec}';")
            else:
                parts.append(f"import {{ f_{dep}_0 }} from '{spec}';")
    parts.append("import fs from 'fs';")
    parts.append("")
    if rng.random() < 0.3:  # block comment with hostile text (SPEC P0)
        parts.append("/* module overview {")
        parts.append(f" * not_a_call_{j}(1) inside comment")
        parts.append(" */")
        parts.append("")
    parts.append(f"const rate_{j} = 0.{(j % 9) + 1}5;")
    parts.append("")
    # f_{j}_0 calls util (if hot), f_{j}_1 (same file) and maybe the dep.
    if rng.random() < 0.3:  # JSDoc docstring (SPEC P7)
        parts.append("/**")
        parts.append(f" * Combines two values through module {j}'s scale.")
        parts.append(f" * @param a base value")
        parts.append(" */")
    parts.append(f"function f_{j}_0(a, b) {{")
    if hot:
        if ns_hot:
            parts.append(f"  const t = U_{j}.util{utils[0]}(a);")
        else:
            parts.append(f"  const t = util{utils[0]}(a);")
    else:
        parts.append("  const t = a * 2;")
    if dep is not None:
        parts.append(f"  const u = f_{dep}_0(t, b);")
        if via_barrel:
            parts.append(f"  const w = first_{dep_pkg}(u);")
        parts.append(f"  return f_{j}_1(u) + b;")
    else:
        parts.append(f"  return f_{j}_1(t) + b;")
    parts.append("}")
    parts.append("")
    parts.append(f"async function f_{j}_1(x) {{")
    if rng.random() < 0.3:  # template literal with braces (SPEC P0)
        parts.append(f"  const label = `mod {{{j}}} at ${{x}} pseudo_call(x)`;")
    parts.append(f"  return x * rate_{j};")
    parts.append("}")
    parts.append("")
    parts.append(f"const h_{j} = (x) => f_{j}_0(x, 1);")
    parts.append("")
    if rng.random() < 0.7:
        parts.append(f"interface I_{j} {{")
        parts.append("  run(x: number): number;")
        parts.append("}")
        parts.append("")
        parts.append(f"class Base_{j} {{")
        parts.append("  greet() {")
        parts.append("    return 'hi';")
        parts.append("  }")
        parts.append("}")
        parts.append("")
        if rng.random() < 0.4:  # decorator on the class (SPEC E6b)
            parts.append(f"@Component_{pkg}()")
        parts.append(f"class C_{j} extends Base_{j} implements I_{j} {{")
        parts.append("  constructor() {")
        parts.append("    this.state = 0;")
        parts.append("  }")
        parts.append("  run(x) {")
        parts.append(f"    return f_{j}_1(x);")
        parts.append("  }")
        parts.append("}")
        parts.append("")
        parts.append(f"export {{ f_{j}_0, h_{j}, C_{j} }};")
    else:
        parts.append(f"export {{ f_{j}_0, h_{j} }};")
    parts.append(f"export default f_{j}_1;")
    parts.append("")
    return "\n".join(parts)


def _component_content(j: int, rng: random.Random, pkg: int) -> str:
    """A ``.tsx`` component module (SPEC P8): calls count only inside
    JSX expression containers; tags, text and attribute strings are
    inert. View_{j} calls f_{j}_0 cross-file (linking) and fmt_{j}
    same-file (CALLS); pseudo_call_{j} in JSX text and the <Card_{j}>
    tag must extract nothing."""
    parts = [f"import {{ f_{j}_0 }} from './mod_{j}';", ""]
    parts.append(f"function fmt_{j}(x) {{")
    parts.append(f"  return x * {(j % 5) + 2};")
    parts.append("}")
    parts.append("")
    parts.append(f"export function View_{j}(props) {{")
    parts.append(f"  const n = f_{j}_0(props.a, {j % 7});")
    parts.append("  return (")
    parts.append(f'    <div className="view-{j}" data-k={{n}}>')
    parts.append(f"      <span>pseudo_call_{j}(n) never counts</span>")
    parts.append(f"      {{fmt_{j}(n)}}")
    if rng.random() < 0.5:  # attribute containers + inline arrow
        parts.append(
            f"      <Card_{j} value={{f_{j}_0(n, 1)}} on={{() => fmt_{j}(n)}} />"
        )
    parts.append("      {props.items.map((x) => (")
    parts.append(f"        <li key={{x}}>{{fmt_{j}(x)}}</li>")
    parts.append("      ))}")
    if rng.random() < 0.5:  # comparison + nested element in a container
        parts.append(f"      {{n > {j % 3} && <em>{{props.label}}</em>}}")
    parts.append(f"      {{/* note: masked_call_{j}(1) */}}")
    parts.append("    </div>")
    parts.append("  );")
    parts.append("}")
    parts.append("")
    parts.append(f"const Card_{j} = (props) => {{")
    parts.append(f'  return <b title="a > b">{{props.value}}</b>;')
    parts.append("};")
    parts.append("")
    parts.append(f"export {{ Card_{j} }};")
    parts.append("")
    return "\n".join(parts)


def _jsx_app_content(r: int) -> str:
    """A ``.jsx`` file (javascript branch of SPEC P8)."""
    return "\n".join(
        [
            f"function render_{r}(x) {{",
            f"  return <p data-x={{x}}>app {r}</p>;",
            "}",
            "",
            f"const app_{r} = (x) => render_{r}(x);",
            "",
            f"export {{ render_{r}, app_{r} }};",
            "",
        ]
    )


def _test_content(j: int, pkg: int) -> str:
    return "\n".join(
        [
            f"import {{ f_{j}_0 }} from '../pkg{pkg}/mod_{j}';",
            "",
            f"function test_f_{j}_0() {{",
            f"  const r = f_{j}_0(1, 2);",
            "  return r === 3;",
            "}",
            "",
        ]
    )


def _v2_suffix(j: int) -> str:
    return "\n".join(
        [
            f"function extra_{j}(y) {{",
            f"  return f_{j}_1(y);",
            "}",
            "",
        ]
    )


def generate_corpus(n_files: int = 200, seed: int = 42, n_repos: int | None = None) -> pa.Table:
    """Generate the corpus table. ``n_files`` is approximate (±small
    constant for per-repo fixtures + adversarial rows)."""
    if n_repos is None:
        n_repos = max(2, min(20, n_files // 100))
    rows_repo: list[str] = []
    rows_path: list[str] = []
    rows_commit: list[str] = []
    rows_lang: list[str] = []
    rows_content: list[str] = []

    def add(repo: str, path: str, commit: str, lang: str, content: str) -> None:
        rows_repo.append(repo)
        rows_path.append(path)
        rows_commit.append(commit)
        rows_lang.append(lang)
        rows_content.append(content)

    per_repo = max(1, n_files // n_repos)
    for r in range(n_repos):
        repo = f"org{r % 3}/repo{r}"
        shas = commit_shas(repo)
        rng = random.Random(seed * 1_000_003 + r)
        add(repo, HOT_MODULE, shas[0], "typescript", _utils_content())
        # modules: leave room for test/config/vendor/py rows
        n_mods = max(1, per_repo - 4 - per_repo // 4)
        for j in range(n_mods):
            pkg = j % 4
            path = f"src/pkg{pkg}/mod_{j}.ts"
            content = _module_content(j, rng, pkg, n_mods)
            add(repo, path, shas[j % 3], "typescript", content)
            if rng.random() < 0.05:
                # second version at a later commit — exercises MODIFIED_IN
                # per version and the max-commit definition-dedup rule.
                later = shas[2] if j % 3 != 2 else shas[1]
                add(repo, path, later, "typescript", content + _v2_suffix(j))
            if rng.random() < 0.15:  # companion .tsx component (SPEC P8)
                add(
                    repo,
                    f"src/pkg{pkg}/View_{j}.tsx",
                    shas[j % 3],
                    "typescript",
                    _component_content(j, rng, pkg),
                )
            if j % 4 == 0:
                add(
                    repo,
                    f"src/__tests__/mod_{j}.test.ts",
                    shas[j % 3],
                    "typescript",
                    _test_content(j, pkg),
                )
        # per-pkg barrel: star re-exports every module (E8c) plus one
        # named alias re-export (E8b) that modules import via '../pkgN'
        for p in range(min(4, n_mods)):
            mods_in_pkg = [j for j in range(n_mods) if j % 4 == p]
            lines = [f"export {{ f_{p}_0 as first_{p} }} from './mod_{p}';"]
            lines += [f"export * from './mod_{j}';" for j in mods_in_pkg]
            add(repo, f"src/pkg{p}/index.ts", shas[0], "typescript",
                "\n".join(lines) + "\n")
        add(repo, f"src/app_{r}.jsx", shas[0], "javascript", _jsx_app_content(r))
        add(repo, "package.json", shas[0], "unknown", '{\n  "name": "%s"\n}\n' % repo)
        add(
            repo,
            f"node_modules/dep{r}/index.js",
            shas[0],
            "javascript",
            "module.exports = function dep() { return 1; };\n",
        )
        add(
            repo,
            f"scripts/tool_{r}.py",
            shas[0],
            "python",
            f"def tool_{r}(x):\n    return x + {r}\n",
        )
    # adversarial rows in repo 0 only
    repo0 = "org0/repo0"
    shas0 = commit_shas(repo0)
    add(repo0, "src/pkg0/empty.ts", shas0[0], "typescript", "")
    add(repo0, "src/pkg0/big.ts", shas0[0], "typescript", "// big\n" + "x" * (1_100_000))
    add(
        repo0,
        "src/pkg0/unicode.ts",
        shas0[0],
        "typescript",
        "function café(x) {\n  return x;\n}\n",
    )
    add(repo0, "src/pkg0/junk.ts", shas0[0], "typescript", "}}{{ ((( \x00\x01 not code ]]]\n")
    add(  # hostile JSX: comparisons stay operators; unterminated JSX masks to EOF
        repo0,
        "src/pkg0/hostile.tsx",
        shas0[0],
        "typescript",
        "function gen(a, b) {\n  return a < b && b > gen(a, 1);\n}\n"
        "const bad = () => <div unterminated\n",
    )

    return pa.Table.from_arrays(
        [
            pa.array(rows_repo, pa.string()),
            pa.array(rows_path, pa.string()),
            pa.array(rows_commit, pa.string()),
            pa.array(rows_lang, pa.string()),
            pa.array(rows_content, pa.large_string()),
        ],
        schema=CORPUS,
    )


def generate_commits_table(corpus: pa.Table, seed: int = 42) -> pa.Table:
    """Git-metadata side table (FIXTURES.md §2): one row per (repo, commit)."""
    import pyarrow.compute as pc  # noqa: F401

    authors = ["alice", "bob", "carol", "dan", "erin"]
    seen: dict[tuple[str, str], int] = {}
    repos = corpus.column("repo").to_pylist()
    commits = corpus.column("commit").to_pylist()
    for rp, cm in zip(repos, commits):
        seen.setdefault((rp, cm), len(seen))
    out_repo, out_commit, out_author, out_date, out_msg = [], [], [], [], []
    for (rp, cm), k in sorted(seen.items()):
        out_repo.append(rp)
        out_commit.append(cm)
        out_author.append(authors[k % len(authors)])
        out_date.append(f"2024-01-{(k % 28) + 1:02d}T00:00:00Z")
        out_msg.append(f"feat: change {k}" if k % 2 == 0 else f"fix: issue {k}")
    return pa.Table.from_arrays(
        [
            pa.array(out_repo),
            pa.array(out_commit),
            pa.array(out_author),
            pa.array(out_date),
            pa.array(out_msg),
        ],
        names=["repo", "commit", "author", "date", "message"],
    )


def generate_prs_table(commits: pa.Table, commits_per_pr: int = 2,
                       seed: int = 42) -> pa.Table:
    """Pull-request side table (J6 analog). The reference has no real
    PR source — it ships two hard-coded mock PRs per repo, each linked
    to the repo's most recent commits (git-analyzer.ts:264-310, an
    acknowledged placeholder). This generator is the deterministic
    table-shaped equivalent: per repo, consecutive runs of
    ``commits_per_pr`` commits roll up into one PR row."""
    authors = ["alice", "bob", "carol", "dan", "erin"]
    by_repo: dict[str, list[str]] = {}
    for rp, cm in zip(commits["repo"].to_pylist(), commits["commit"].to_pylist()):
        by_repo.setdefault(rp, []).append(cm)
    rows = []
    for rp in sorted(by_repo):
        shas = sorted(by_repo[rp])
        for k in range(0, len(shas), commits_per_pr):
            pr_num = k // commits_per_pr + 1
            rows.append({
                "repo": rp,
                "pr_id": f"pr-{pr_num}",
                "title": f"Change set {pr_num}",
                "author": authors[(len(rp) + pr_num) % len(authors)],
                "url": f"https://example.invalid/{rp}/pull/{pr_num}",
                "body": f"Rolls up {len(shas[k:k + commits_per_pr])} commits.",
                "commit_shas": shas[k:k + commits_per_pr],
            })
    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("repo", pa.string()), ("pr_id", pa.string()),
        ("title", pa.string()), ("author", pa.string()),
        ("url", pa.string()), ("body", pa.string()),
        ("commit_shas", pa.list_(pa.string())),
    ]))


def corpus_files_for_sf(sf_dir: str) -> int:
    """Scale knob keyed off the driver's sf directory name (FIXTURES.md:
    smoke ≈200 @ sf0.001, correctness ≈2k @ sf0.01, bench ≈20k @ sf0.1)."""
    if "0.001" in sf_dir:
        return 200
    if "0.01" in sf_dir:
        return 2000
    if "0.1" in sf_dir:
        return 20000
    return 200


_np = np  # keep numpy import referenced (vectorized helpers live elsewhere)
