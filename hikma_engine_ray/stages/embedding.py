"""Embedding stage (SURVEY.md §2.2 M10/M12 — the canonical actor pool).

The reference loads an embedding model once per process (a persistent
Python subprocess, embed_server.py:22-43) and batches 32 nodes at a time
(embedding-service.ts:615-644). Here the provider is an actor-pool
``map_batches`` class: state (provider setup) in ``__init__``, batched
encode in ``__call__``.

Default provider is the reference's deterministic **hash embedding**
fallback (embedding-service.ts:259-273): seed a PRNG from the node's
source text, draw a fixed-dim vector, L2-normalize — oracle-checkable
and model-free. A real model (transformers etc.) would subclass and
override ``_encode`` only; nothing else in the pipeline changes.

Per-type source-text projection mirrors getTextForNode
(embedding-service.ts:134-217): name + signature for functions, path +
name for files, etc.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..schemas import EMBEDDING_DIM


def node_text(node_type, name, path, signature):
    """Per-type embedding source text (embedding-service.ts:134-217)."""
    if node_type in ("Function", "ArrowFunction", "Method", "TestCase"):
        return f"{name} {signature or ''}".strip()
    if node_type == "File":
        return f"{path or ''} {name or ''}".strip()
    if node_type in ("Class", "Interface"):
        return f"{node_type.lower()} {name} {signature or ''}".strip()
    if node_type == "Commit":
        return f"commit {name}"
    return f"{node_type}:{name or ''}"


class HashEmbedder:
    """Actor-pool stage: nodes table in → same table + ``embedding``
    (fixed-size list<float32>) + ``source_text`` columns out."""

    def __init__(self, dim: int = EMBEDDING_DIM):
        self.dim = dim  # per-actor state; a real model would load here

    def _encode(self, texts: list[str]) -> np.ndarray:
        # fully vectorized counter-based PRN: splitmix64 over a
        # (seed × counter) grid + Box-Muller — no per-row RNG objects.
        # Deterministic per source text (seeded by its crc32).
        n, dim = len(texts), self.dim
        seeds = np.fromiter(
            (zlib.crc32(t.encode("utf-8", "surrogatepass")) for t in texts),
            dtype=np.uint64,
            count=n,
        )
        half = dim // 2
        ctr = np.arange(1, half + 1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            x = seeds[:, None] * np.uint64(0x9E3779B97F4A7C15) + ctr[None, :] * np.uint64(
                0xBF58476D1CE4E5B9
            )
            x ^= x >> np.uint64(30)
            x *= np.uint64(0xBF58476D1CE4E5B9)
            x ^= x >> np.uint64(27)
            x *= np.uint64(0x94D049BB133111EB)
            x ^= x >> np.uint64(31)
        # two uniforms per lane (hi/lo 32 bits) → Box-Muller pair:
        # two normals per lane, float32 transcendentals
        hi = (((x >> np.uint64(32)).astype(np.float32)) + 1.0) / np.float32(4294967297.0)
        lo = ((x & np.uint64(0xFFFFFFFF)).astype(np.float32)) / np.float32(4294967296.0)
        r = np.sqrt(np.float32(-2.0) * np.log(hi))
        theta = np.float32(2.0 * np.pi) * lo
        out = np.empty((n, dim), dtype=np.float32)
        out[:, 0::2] = r * np.cos(theta)
        out[:, 1::2] = r * np.sin(theta)
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        np.maximum(norms, 1e-12, out=norms)
        out /= norms
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        types = batch["node_type"].to_pylist()
        names = batch["name"].to_pylist()
        paths = batch["path"].to_pylist()
        sigs = batch["signature"].to_pylist()
        texts = [
            node_text(types[i], names[i], paths[i], sigs[i])
            for i in range(batch.num_rows)
        ]
        vecs = self._encode(texts)
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.ravel(), pa.float32()), self.dim
        )
        batch = batch.append_column("source_text", pa.array(texts, pa.string()))
        return batch.append_column("embedding", emb)


class ModelEmbedder(HashEmbedder):
    """Model-backed actor-pool provider (ST1 — the reference's persistent
    embed server, embed_server.py:22-43 / embedding-py.ts:15-70).

    Use as::

        nodes.map_batches(
            ModelEmbedder,
            concurrency=(N, N),
            batch_size=32,                    # reference default batch
            fn_constructor_kwargs={"model_factory": load_my_model},
        )

    ``model_factory`` runs ONCE per actor in ``__init__`` (never per
    batch — tested in tests/test_embedding_provider.py); the object it
    returns must expose ``encode(list[str]) -> array`` of shape
    ``(n, dim)`` (already pooled) or ``(n, tokens, dim)`` (mean-pooled
    here, embed_server.py:67-74). Output is L2-normalized like the
    reference server. No real model ships in this environment; the
    factory hook is where a transformers/ONNX model plugs in."""

    def __init__(self, model_factory, dim: int = EMBEDDING_DIM):
        super().__init__(dim)
        self.model = model_factory()  # per-actor state: loaded once

    def _encode(self, texts: list[str]) -> np.ndarray:
        vecs = np.asarray(self.model.encode(texts), dtype=np.float32)
        if vecs.ndim == 3:  # token-level output → mean-pool
            vecs = vecs.mean(axis=1)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        np.maximum(norms, 1e-12, out=norms)
        return vecs / norms


_CACHED: HashEmbedder | None = None


def hash_embed_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task variant: the hash provider's only state is trivial
    (no model weights), so a worker-process-cached encoder beats paying
    actor-pool spin-up. A REAL model provider must use the HashEmbedder
    actor-pool form instead (`map_batches(ModelEmbedder, concurrency=N)`)
    — weights load once per actor there."""
    global _CACHED
    if _CACHED is None:
        _CACHED = HashEmbedder()
    return _CACHED(batch)
