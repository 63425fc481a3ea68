"""Multimodal column plumbing (images / audio / video as opaque binary).

The decode step itself is STUBBED — image/audio codecs are not in this
container — but everything Ray-side is real and tested: binary column
schema, typed metadata, actor-pool stage shape, small-batch sizing for
wide rows, deterministic fake feature extraction so downstream stages
(similarity, dedup) can be exercised end-to-end.

Swap ``DecodeStub`` for a real decoder (PIL / torchaudio / PyAV) by
overriding ``_decode`` only; `media_batch_size` stays the knob that
keeps batch × concurrency within worker heap for multi-MB payloads.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
        ("meta_duration_ms", pa.int32()),
    ]
)

# wide binary rows: keep batches small so batch × concurrency fits heap
MEDIA_BATCH_SIZE = 64


def synthesize_media_table(n: int = 64, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows for tests (no external data)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": list(range(n)),
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": [rng.bytes(payload_bytes) for _ in range(n)],
        "meta_width": [64 + (i % 8) * 16 for i in range(n)],
        "meta_height": [64 + (i % 5) * 16 for i in range(n)],
        "meta_duration_ms": [0 if i % 3 == 0 else 1000 + i for i in range(n)],
    }
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


class DecodeStub:
    """Actor-pool stage: binary payload → fixed-dim feature vector.

    A real decoder loads its codec/model here in ``__init__`` (once per
    actor). The stub derives a deterministic feature from the payload
    bytes so the full pipeline shape is testable. Set ``strict=True`` to
    get the honest NotImplementedError instead of fake features."""

    def __init__(self, dim: int = 32, strict: bool = False):
        self.dim = dim
        self.strict = strict

    def _decode(self, payload: bytes, kind: str) -> np.ndarray:
        if self.strict:
            raise NotImplementedError(
                "media decode requires an image/audio codec not present in "
                "this environment; subclass DecodeStub and override _decode"
            )
        seed = zlib.crc32(hashlib.md5(payload).digest())
        rng = np.random.RandomState(seed)
        v = rng.standard_normal(self.dim).astype(np.float32)
        return v / max(float(np.linalg.norm(v)), 1e-12)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        feats = np.stack(
            [self._decode(p, k) for p, k in zip(payloads, kinds)]
        ) if payloads else np.zeros((0, self.dim), dtype=np.float32)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), pa.float32()), self.dim
        )
        # drop the heavy payload on the way out — features flow onward,
        # bytes do not cross another stage boundary
        keep = batch.drop_columns(["payload"])
        return keep.append_column("feature", col)


def extract_features(ds, concurrency=(1, 4), dim: int = 32):
    """The canonical wide-row actor-pool stage: small batches, payload
    dropped at the stage boundary."""
    return ds.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=1,
    )
