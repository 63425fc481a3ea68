"""RAG read path: top-k search results → assembled LLM prompt (§ missing-3).

Re-expresses the reference's third subsystem — the way users actually
consume search results — with the LLM call itself stubbed (no network
in this sandbox):

  select_system_prompt   query-keyword prompt routing
                         (OpenAILLMProvider.ts:622-636)
  build_context          similarity-desc greedy packing into an
                         8000-char budget, tail truncation with a
                         100-char buffer and a 200-char minimum
                         (OpenAILLMProvider.ts:641-673)
  format_search_result   File/Type/Similarity header + fenced source
                         (OpenAILLMProvider.ts:678-681)
  build_user_message     structured query+context template
                         (OpenAILLMProvider.ts:704-720)
  assemble_rag_prompt    the full transform (transformToOpenAIRequest,
                         OpenAILLMProvider.ts:574-618)
  ProviderManager        health-checked fallback chain over pluggable
                         providers (LLMProviderManager.ts:61-80,
                         llm-rag.ts:77-133); ships a deterministic
                         EchoProvider so the path runs end-to-end here

Prompt assembly is inherently driver-side: it runs over ≤ k top-k rows
(k ≈ 10), never over the corpus. The distributed half is the search
that produces those rows (pipelines/search.py); ``rag_query`` glues the
two together and is the operator exposed through ``queries()``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from hashlib import sha256

import pyarrow as pa

MAX_CONTEXT_CHARS = 8000  # OpenAILLMProvider.ts:642
TRUNCATION_BUFFER = 100   # :652
MIN_TRUNCATED = 200       # :653

# Own wording; routing keys follow OpenAILLMProvider.ts:622-636.
SYSTEM_PROMPTS = {
    "default": (
        "You are a senior engineer explaining code from a knowledge "
        "graph index. Ground every statement in the provided search "
        "results; say so when the context is insufficient."
    ),
    "debugging": (
        "You are a senior engineer helping debug a codebase. Use the "
        "provided search results to locate likely fault sites, explain "
        "the failure mechanism, and propose concrete fixes."
    ),
    "architecture": (
        "You are a software architect. Use the provided search results "
        "to describe the design: components, their responsibilities, "
        "and how they interact."
    ),
}


def select_system_prompt(query: str) -> str:
    q = query.lower()
    if any(w in q for w in ("debug", "error", "bug")):
        return SYSTEM_PROMPTS["debugging"]
    if any(w in q for w in ("architecture", "design", "pattern")):
        return SYSTEM_PROMPTS["architecture"]
    return SYSTEM_PROMPTS["default"]


def format_search_result(path: str, node_type: str, similarity: float,
                         source_text: str) -> str:
    pct = f"{similarity * 100:.1f}"
    return (f"File: {path}\nType: {node_type}\nSimilarity: {pct}%\n\n"
            f"```\n{source_text.strip()}\n```")


def _truncate_result(path: str, node_type: str, similarity: float,
                     source_text: str, max_len: int) -> str:
    header_len = len(format_search_result(path, node_type, similarity, ""))
    avail = max_len - header_len - 20
    if avail <= 0:
        return ""
    if len(source_text) > avail:
        source_text = source_text[:avail] + "\n... [truncated]"
    return format_search_result(path, node_type, similarity, source_text)


def build_context(results: list[dict],
                  max_context_chars: int = MAX_CONTEXT_CHARS) -> tuple[str, int]:
    """Greedy similarity-desc packing; returns (context_text, n_included)."""
    parts: list[str] = []
    used = 0
    ordered = sorted(results, key=lambda r: -float(r.get("similarity", 0.0)))
    for r in ordered:
        txt = format_search_result(
            r["path"] or "", r["node_type"], float(r["similarity"]),
            r.get("source_text") or "")
        if used + len(txt) > max_context_chars:
            remaining = max_context_chars - used - TRUNCATION_BUFFER
            if remaining > MIN_TRUNCATED:
                t = _truncate_result(
                    r["path"] or "", r["node_type"], float(r["similarity"]),
                    r.get("source_text") or "", remaining)
                if t:
                    parts.append(t)
            break
        parts.append(txt)
        used += len(txt)
    return "\n\n".join(parts), len(parts)


def build_user_message(query: str, context_text: str) -> str:
    return (
        f"Query: {query}\n\n"
        "Based on the following code search results from the codebase, "
        "please provide a comprehensive explanation:\n\n"
        f"{context_text}\n\n"
        "Address what the code does, the key components and their "
        "relationships, notable implementation details, and any patterns "
        "demonstrated. Keep the response focused and technical."
    )


def assemble_rag_prompt(query: str, results: list[dict],
                        max_context_chars: int = MAX_CONTEXT_CHARS) -> dict:
    """Full request-shaping transform (transformToOpenAIRequest)."""
    context_text, included = build_context(results, max_context_chars)
    return {
        "system": select_system_prompt(query),
        "user": build_user_message(query, context_text),
        "included_results": included,
        "context_chars": len(context_text),
    }


# ---------------------------------------------------------------------------
# Provider manager (ST3): health-checked fallback chain. The actual LLM
# transports (HTTP servers, subprocesses) don't exist in this sandbox;
# EchoProvider is the deterministic stand-in and the extension point is
# the RAGProvider duck type.


_URL_SUFFIXES = ("/v1/embeddings", "/api/embeddings", "/v1")


def normalize_provider_base_url(raw_url: str) -> str:
    """M13 config utility: strip endpoint suffixes and trailing slashes
    from a provider base URL (embedding-service.ts:288-300)."""
    url = (raw_url or "").strip().rstrip("/")
    low = url.lower()
    for suf in _URL_SUFFIXES:
        if low.endswith(suf):
            url = url[: -len(suf)]
            low = url.lower()
    return url.rstrip("/")


class EchoProvider:
    """Deterministic no-model provider: digests the assembled prompt.
    Stands in for the OpenAI-compat / python-subprocess transports
    (OpenAILLMProvider.ts, llm-rag.ts:executePythonRAGDirect)."""

    name = "echo"

    def healthy(self) -> bool:
        return True

    def generate(self, system: str, user: str, **options) -> str:
        digest = sha256((system + "\0" + user).encode()).hexdigest()[:16]
        return f"[echo:{digest}] {user[:200]}"


class FailingProvider:
    """Test double for the fallback path."""

    name = "failing"

    def __init__(self, *, unhealthy: bool = False):
        self._unhealthy = unhealthy
        self.calls = 0

    def healthy(self) -> bool:
        return not self._unhealthy

    def generate(self, system: str, user: str, **options) -> str:
        self.calls += 1
        raise RuntimeError("provider down")


class RetryingProvider:
    """Bounded-retry + deadline wrapper around any provider — the
    request/timeout/retry policy a REAL network transport needs
    (the reference's HTTP clients retry and time out;
    embedding-service.ts:41-127), kept transport-agnostic so it wraps
    the Echo stand-in here and an HTTP provider in production
    unchanged. Exponential backoff with an injectable ``sleep`` /
    ``clock`` (deterministic in tests, no wall-clock flake); a
    ``deadline_s`` budget stops retrying early so one sick provider
    cannot stall the whole fallback chain — the manager then falls
    through to the next provider as usual."""

    def __init__(self, inner, *, max_attempts: int = 3,
                 backoff_s: float = 0.5, deadline_s: float | None = None,
                 sleep=None, clock=None):
        import time as _time

        assert max_attempts >= 1
        self.inner = inner
        self.max_attempts = max_attempts
        self.backoff_s = backoff_s
        self.deadline_s = deadline_s
        self._sleep = sleep if sleep is not None else _time.sleep
        self._clock = clock if clock is not None else _time.monotonic
        self.attempts = 0  # observability: total calls made

    @property
    def name(self) -> str:
        return f"retry({self.inner.name})"

    def healthy(self) -> bool:
        return self.inner.healthy()

    def generate(self, system: str, user: str, **options) -> str:
        start = self._clock()
        last: Exception | None = None
        for i in range(self.max_attempts):
            if (self.deadline_s is not None
                    and self._clock() - start >= self.deadline_s):
                raise TimeoutError(
                    f"{self.name}: deadline {self.deadline_s}s exhausted "
                    f"after {i} attempts") from last
            try:
                self.attempts += 1
                return self.inner.generate(system, user, **options)
            except Exception as exc:  # noqa: BLE001 — retry then re-raise
                last = exc
                if i + 1 < self.max_attempts:
                    self._sleep(self.backoff_s * (2 ** i))
        raise last


@dataclass
class ProviderManager:
    """Try providers in priority order, skipping unhealthy ones and
    falling through on per-call failure (LLMProviderManager.ts:61-80)."""

    providers: list = field(default_factory=lambda: [EchoProvider()])

    def generate_explanation(self, query: str, results: list[dict],
                             **options) -> dict:
        prompt = assemble_rag_prompt(query, results)
        errors: list[str] = []
        for p in self.providers:
            if not p.healthy():
                errors.append(f"{p.name}: unhealthy")
                continue
            try:
                text = p.generate(prompt["system"], prompt["user"], **options)
                return {"success": True, "provider": p.name,
                        "explanation": text, **prompt}
            except Exception as exc:  # noqa: BLE001 — fallback chain
                errors.append(f"{p.name}: {exc}")
        return {"success": False, "provider": None,
                "error": "; ".join(errors) or "no providers", **prompt}


def rag_query(nodes_ds, query: str, k: int = 10,
              manager: ProviderManager | None = None) -> pa.Table:
    """Distributed top-k search → driver-side prompt assembly →
    provider chain. Returns a one-row provenance table (deterministic,
    suitable for the driver's rows-only check)."""
    import ray

    from .search import semantic_search

    top = semantic_search(nodes_ds, query, k=k).take_all()
    ids = {r["node_id"] for r in top}
    if ids:
        ids_ref = ray.put(ids)

        def fetch(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            wanted = ray.get(ids_ref)
            t = t.filter(pc.is_in(t["node_id"], value_set=pa.array(list(wanted))))
            return t.select(["node_id", "source_text"])

        texts = {
            r["node_id"]: r["source_text"]
            for r in nodes_ds.map_batches(fetch, batch_format="pyarrow").take_all()
        }
        for r in top:
            r["source_text"] = texts.get(r["node_id"]) or ""
    mgr = manager or ProviderManager()
    res = mgr.generate_explanation(query, top)
    return pa.table({
        "query": [query],
        "provider": [res["provider"] or ""],
        "success": [res["success"]],
        "included_results": [res["included_results"]],
        "context_chars": [res["context_chars"]],
        "explanation_sha256": [sha256((res.get("explanation") or "").encode()).hexdigest()],
    })
