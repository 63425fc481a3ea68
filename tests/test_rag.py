"""RAG read path: prompt routing, context packing, provider fallback,
and the end-to-end search→assemble operator."""

from hikma_engine_ray.pipelines.rag import (
    MAX_CONTEXT_CHARS,
    EchoProvider,
    FailingProvider,
    ProviderManager,
    assemble_rag_prompt,
    build_context,
    format_search_result,
    rag_query,
    select_system_prompt,
)


def _result(i, sim, text_len=500):
    return {"node_id": f"n{i}", "node_type": "Function", "name": f"f{i}",
            "path": f"src/f{i}.ts", "similarity": sim,
            "source_text": ("x" * text_len)}


def test_system_prompt_routing():
    assert "debug" in select_system_prompt("why this ERROR happens")
    assert "architect" in select_system_prompt("explain the design pattern")
    assert select_system_prompt("what does foo do") == select_system_prompt("hello")


def test_context_packs_by_similarity_desc():
    results = [_result(1, 0.2), _result(2, 0.9), _result(3, 0.5)]
    ctx, n = build_context(results)
    assert n == 3
    # highest similarity first
    assert ctx.index("src/f2.ts") < ctx.index("src/f3.ts") < ctx.index("src/f1.ts")


def test_context_budget_and_truncation():
    # each formatted result ≈ 4000+ chars → only one fits whole,
    # the second is truncated into the remaining space
    results = [_result(1, 0.9, 4000), _result(2, 0.8, 4000), _result(3, 0.7, 4000)]
    ctx, n = build_context(results)
    assert len(ctx) <= MAX_CONTEXT_CHARS
    assert n == 2
    assert "... [truncated]" in ctx
    # tiny budget → nothing fits, no crash
    ctx2, n2 = build_context(results, max_context_chars=50)
    assert n2 == 0 and ctx2 == ""


def test_assemble_prompt_shape():
    out = assemble_rag_prompt("how does login work", [_result(1, 0.9)])
    assert out["included_results"] == 1
    assert "Query: how does login work" in out["user"]
    assert "src/f1.ts" in out["user"]
    assert out["context_chars"] > 0


def test_provider_fallback_chain():
    down = FailingProvider()
    sick = FailingProvider(unhealthy=True)
    mgr = ProviderManager([sick, down, EchoProvider()])
    res = mgr.generate_explanation("q", [_result(1, 0.9)])
    assert res["success"] and res["provider"] == "echo"
    assert down.calls == 1  # tried and failed before fallback
    res2 = ProviderManager([down]).generate_explanation("q", [])
    assert not res2["success"] and "provider down" in res2["error"]


def test_rag_query_end_to_end(built_graph):
    t = rag_query(built_graph["nodes"], "utility function", k=5)
    assert t.num_rows == 1
    row = t.to_pylist()[0]
    assert row["success"]
    assert row["included_results"] >= 1
    assert len(row["explanation_sha256"]) == 64
    # deterministic across runs
    t2 = rag_query(built_graph["nodes"], "utility function", k=5)
    assert t2.to_pylist()[0]["explanation_sha256"] == row["explanation_sha256"]


def test_normalize_provider_base_url():
    from hikma_engine_ray.pipelines.rag import normalize_provider_base_url as f

    assert f("http://x:1234/v1/embeddings") == "http://x:1234"
    assert f("http://x/api/embeddings/") == "http://x"
    assert f("http://x/V1") == "http://x"
    assert f(" http://x// ") == "http://x"
    assert f("") == ""


def test_retrying_provider_transient_then_success():
    """Transient failures are retried with exponential backoff; the
    wrapper succeeds without waking the fallback chain."""
    from hikma_engine_ray.pipelines.rag import (EchoProvider,
                                                RetryingProvider)

    class Flaky:
        name = "flaky"

        def __init__(self, fail_times):
            self.fail_times, self.calls = fail_times, 0

        def healthy(self):
            return True

        def generate(self, system, user, **options):
            self.calls += 1
            if self.calls <= self.fail_times:
                raise RuntimeError(f"transient #{self.calls}")
            return "ok:" + user[:10]

    slept = []
    p = RetryingProvider(Flaky(2), max_attempts=3, backoff_s=0.5,
                         sleep=slept.append)
    assert p.generate("s", "hello world") == "ok:hello worl"[:13]
    assert p.attempts == 3
    assert slept == [0.5, 1.0]  # exponential
    assert p.name == "retry(flaky)" and p.healthy()
    assert isinstance(EchoProvider().generate("a", "b"), str)


def test_retrying_provider_exhaustion_falls_through_chain():
    """Permanent failure re-raises after max_attempts, and the manager
    falls through to the next provider."""
    from hikma_engine_ray.pipelines.rag import (EchoProvider,
                                                FailingProvider,
                                                ProviderManager,
                                                RetryingProvider)

    down = FailingProvider()
    wrapped = RetryingProvider(down, max_attempts=3, sleep=lambda s: None)
    mgr = ProviderManager([wrapped, EchoProvider()])
    res = mgr.generate_explanation("q", [])
    assert res["success"] is True and res["provider"] == "echo"
    assert down.calls == 3  # all attempts consumed before fallback


def test_retrying_provider_deadline():
    """The deadline budget stops retrying early (TimeoutError) so a
    sick provider cannot stall the chain."""
    import pytest

    from hikma_engine_ray.pipelines.rag import (FailingProvider,
                                                RetryingProvider)

    t = [0.0]

    def clock():
        return t[0]

    def sleep(s):
        t[0] += s

    p = RetryingProvider(FailingProvider(), max_attempts=10,
                         backoff_s=4.0, deadline_s=5.0,
                         sleep=sleep, clock=clock)
    with pytest.raises(TimeoutError, match="deadline"):
        p.generate("s", "u")
    assert p.attempts == 2  # 0s try, +4s backoff, second try, then stop
