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
