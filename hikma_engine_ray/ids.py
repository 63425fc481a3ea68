"""Deterministic, content-addressed identity scheme.

The reference mixes deterministic ids (``createNodeId`` at
reference ``src/modules/ast-parser.ts:130-139``, business keys at
``src/types/enhanced-graph.ts:211-251``, repo id
``sha256(resolve(projectRoot))[:16]`` at ``src/core/PhaseManager.ts:488-493``)
with non-deterministic uuid4 / ``Date.now()`` fallbacks
(``src/core/indexing/NodeCreator.ts:8,28``). Non-determinism breaks
idempotent retries, so this build is 100% content-addressed: the same
input rows always produce the same node ids, making every stage safely
re-runnable (Ray task retries, checkpoint resume).

Vectorized variants operate on numpy object arrays for use inside
``map_batches`` hot paths.
"""

from __future__ import annotations

import hashlib

import numpy as np

SEP = "\x1f"  # unit separator — cannot appear in paths/names we generate


def _h(text: str, n: int) -> str:
    return hashlib.sha256(text.encode("utf-8", "surrogatepass")).hexdigest()[:n]


def repo_id(repo: str) -> str:
    """16-hex repo id (mirrors reference PhaseManager.ts:488-493 semantics)."""
    return _h(repo, 16)


def commit_id(commit_sha: str) -> str:
    """Commit node id — ``commit:{sha}`` (reference git-analyzer.ts:139-141)."""
    return f"commit:{commit_sha}"


def file_id(repo: str, commit: str, path: str) -> str:
    """20-hex file id over (repo, commit, path).

    Semantics of BusinessKey ``{repoId}@{commitSha}:{path}``
    (reference enhanced-graph.ts:220-222), content-addressed.
    """
    return _h(f"{repo}{SEP}{commit}{SEP}{path}", 20)


def entity_id(fid: str, kind: str, name: str, start_line: int, start_col: int) -> str:
    """20-hex entity id — semantics of ``createNodeId``
    (reference ast-parser.ts:130-139): file + kind + name + position.
    """
    return _h(f"{fid}{SEP}{kind}{SEP}{name}{SEP}{start_line}{SEP}{start_col}", 20)


def sha256_hex(data: bytes | str) -> str:
    if isinstance(data, str):
        data = data.encode("utf-8", "surrogatepass")
    return hashlib.sha256(data).hexdigest()


# ---------------------------------------------------------------- vectorized

def file_ids_vec(repos: np.ndarray, commits: np.ndarray, paths: np.ndarray) -> np.ndarray:
    """Vectorized file_id over parallel object arrays."""
    out = np.empty(len(repos), dtype=object)
    sep = SEP
    for i in range(len(repos)):
        out[i] = _h(f"{repos[i]}{sep}{commits[i]}{sep}{paths[i]}", 20)
    return out


def sha256_vec(texts: np.ndarray) -> np.ndarray:
    """Vectorized sha256 hex over an object array of strings.

    hashlib releases the GIL for large buffers; per-row python overhead is
    ~1µs — fine inside a 4-8k-row batch, and the only way to get sha256
    (pyarrow has no sha kernels).
    """
    out = np.empty(len(texts), dtype=object)
    for i, t in enumerate(texts):
        out[i] = hashlib.sha256(
            t.encode("utf-8", "surrogatepass") if isinstance(t, str) else (t or b"")
        ).hexdigest()
    return out
