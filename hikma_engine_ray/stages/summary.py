"""Summary generation (SURVEY.md §2.2 M9).

The reference's "AI" summary is a deterministic keyword heuristic
(summary-generator.ts:74-129, 205-284): count lines/words, detect
functions / imports / tests, compose a sentence, truncate to
``max_len`` with an ellipsis (:92-96). Stateless vectorized
``map_batches`` stage over the corpus (file-level summaries).
A real LLM provider would slot in as an actor pool like the embedder.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def summarize_batch(batch: pa.Table, max_len: int = 2000) -> pa.Table:
    content = batch["content"]
    n_lines = pc.add(
        pc.count_substring(pc.cast(content, pa.large_string()), "\n"), 1
    )
    has_function = pc.match_substring(content, "function ")
    has_import = pc.match_substring(content, "import ")
    has_test = pc.match_substring(content, "test")
    paths = batch["path"].to_pylist()
    nl = n_lines.to_pylist()
    hf = has_function.to_pylist()
    hi = has_import.to_pylist()
    ht = has_test.to_pylist()
    out = []
    for i in range(batch.num_rows):
        bits = [f"{paths[i]}: {nl[i]} lines"]
        if hf[i]:
            bits.append("defines functions")
        if hi[i]:
            bits.append("has imports")
        if ht[i]:
            bits.append("test-related")
        s = "; ".join(bits)
        out.append(s[: max_len - 3] + "..." if len(s) > max_len else s)
    return batch.append_column("summary", pa.array(out, pa.string()))
