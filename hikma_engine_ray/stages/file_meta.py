"""File-metadata projection + size filter (SURVEY.md §2 S3 / M1-M4).

Stateless vectorized ``map_batches`` stage over zero-copy Arrow batches.
Computes, per corpus row:
  - ``file_id``        content-addressed id over (repo, commit, path)
  - ``content_sha256`` per-row invariant (reference file-scanner.ts:195)
  - ``size_kb``        float32 (reference FileMetadata.sizeKb)
  - ``ext``, ``lang_detected``  ext → language (ast-parser.ts:115-128)
  - ``file_type``      source|test|config|dev|vendor (ast-parser.ts:300-331)
  - ``is_test``        test-path predicate (ast-parser.ts:106-113)
and drops rows whose content exceeds 1 MiB (config/index.ts:128,
file-scanner.ts:78-83).

Classification is pyarrow-vectorized (regex kernels over ``path``); only
sha256 runs a tight per-row hashlib loop (no Arrow kernel exists for it).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.rules import (
    CONFIG_RE,
    DEV_RE,
    EXT_LANG,
    MAX_FILE_BYTES,
    TEST_RE,
    VENDOR_RE,
)
from ..ids import file_ids_vec, sha256_vec


def file_meta_batch(batch: pa.Table) -> pa.Table:
    # size filter first — everything downstream skips oversize rows
    nbytes = pc.binary_length(pc.cast(batch["content"], pa.large_binary()))
    batch = batch.filter(pc.less_equal(nbytes, MAX_FILE_BYTES))
    if batch.num_rows == 0:
        return _with_meta_columns(batch, empty=True)
    return _with_meta_columns(batch)


def _with_meta_columns(batch: pa.Table, empty: bool = False) -> pa.Table:
    n = batch.num_rows
    path = batch["path"]
    if empty:
        for name, typ in [
            ("file_id", pa.string()),
            ("content_sha256", pa.string()),
            ("size_kb", pa.float32()),
            ("ext", pa.string()),
            ("lang_detected", pa.string()),
            ("file_type", pa.string()),
            ("is_test", pa.bool_()),
        ]:
            batch = batch.append_column(name, pa.array([], typ))
        return batch

    # ext: substring after last '.' of the basename (vectorized)
    ext = pc.extract_regex(path, r"[^/.](?P<ext>\.[A-Za-z0-9_]+)$")
    ext = pc.if_else(
        pc.is_valid(ext), pc.utf8_lower(pc.struct_field(ext, "ext")), pa.scalar("")
    )
    lang_detected = _dict_lookup(ext, EXT_LANG, "unknown")

    is_test = _re_match(path, TEST_RE.pattern)
    is_vendor = _re_match(path, VENDOR_RE.pattern)
    is_config = _re_match(path, CONFIG_RE.pattern)
    is_dev = _re_match(path, DEV_RE.pattern)
    # priority: vendor > test > config > dev > source (ast-parser.ts:300-331)
    file_type = pc.if_else(
        is_vendor,
        pa.scalar("vendor"),
        pc.if_else(
            is_test,
            pa.scalar("test"),
            pc.if_else(
                is_config,
                pa.scalar("config"),
                pc.if_else(is_dev, pa.scalar("dev"), pa.scalar("source")),
            ),
        ),
    )

    repo_np = np.asarray(batch["repo"].to_numpy(zero_copy_only=False), dtype=object)
    commit_np = np.asarray(batch["commit"].to_numpy(zero_copy_only=False), dtype=object)
    path_np = np.asarray(path.to_numpy(zero_copy_only=False), dtype=object)
    content_np = np.asarray(
        batch["content"].to_numpy(zero_copy_only=False), dtype=object
    )

    fid = pa.array(file_ids_vec(repo_np, commit_np, path_np), pa.string())
    sha = pa.array(sha256_vec(content_np), pa.string())
    size_kb = pc.cast(
        pc.divide(
            pc.cast(pc.binary_length(pc.cast(batch["content"], pa.large_binary())), pa.float64()),
            1024.0,
        ),
        pa.float32(),
    )

    batch = batch.append_column("file_id", fid)
    batch = batch.append_column("content_sha256", sha)
    batch = batch.append_column("size_kb", size_kb)
    batch = batch.append_column("ext", ext)
    batch = batch.append_column("lang_detected", lang_detected)
    batch = batch.append_column("file_type", file_type)
    batch = batch.append_column("is_test", is_test)
    return batch


def _re_match(arr: pa.ChunkedArray | pa.Array, pattern: str) -> pa.Array:
    """pyarrow uses RE2 — translate the few Python-isms we rely on."""
    return pc.match_substring_regex(arr, pattern)


def _dict_lookup(arr, mapping: dict[str, str], default: str):
    """Vectorized dict lookup via dictionary-encode + take."""
    enc = pc.dictionary_encode(arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    dict_vals = enc.dictionary.to_pylist()
    mapped = pa.array([mapping.get(v, default) for v in dict_vals], pa.string())
    return pc.take(mapped, enc.indices)
