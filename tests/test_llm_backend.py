"""The batched LLM extraction backend (A14 behind the seam): prompt
assembly -> batched transport calls -> JSON parse -> retry/quarantine,
plus token-per-minute budgeting (Flow.py:14 analog). The mock transport
derives replies ONLY from the message list, so these tests exercise the
full round-trip, not a bypass."""

from __future__ import annotations

from functools import partial

import pytest

from gondar_spark.extraction.llm import (
    _SHARED_LIMITERS,
    BatchLLMExtractor,
    HttpChatTransport,
    MockChatTransport,
    TokenRateLimiter,
    TransportError,
    estimate_tokens,
    parse_reply,
    shared_limiter,
)
from gondar_spark.extraction.prompts import build_messages
from gondar_spark.extraction.spec import extract_from_content

SAMPLE = "def alpha(ctx):\nclass Beta:\nimport core.utils\n    out = alpha(ctx)"


def test_transport_roundtrip_matches_spec_extractor():
    t = MockChatTransport()
    msgs = build_messages(SAMPLE, "r:p.py", "python", 0)
    reply = t.request(msgs, model="m", temperature=0.0, seed=1001,
                      response_format={"type": "json_object"})
    facts = parse_reply(reply["choices"][0]["message"]["content"])
    assert facts == extract_from_content("python", SAMPLE)
    assert reply["usage"]["prompt_tokens"] > 0
    assert t.usage_completion_tokens > 0


def test_rate_limiter_blocks_at_budget():
    clock_now = [0.0]
    waits: list[float] = []

    def clock():
        return clock_now[0]

    def sleep(s):
        waits.append(s)
        clock_now[0] += s

    lim = TokenRateLimiter(1000, clock=clock, sleep=sleep)
    lim.acquire(600)
    assert waits == []            # fits in window
    lim.acquire(600)              # would exceed -> waits for window roll
    assert len(waits) == 1 and waits[0] == pytest.approx(60.0)
    lim.acquire(300)              # fresh window, fits
    assert len(waits) == 1
    clock_now[0] += 61
    lim.acquire(1000)             # window expired naturally -> no wait
    assert len(waits) == 1


def test_batch_extractor_one_request_per_chunk_happy_path():
    """The headline batching contract: with no faults, request count is
    EXACTLY ceil(rows / prompt_batch_size) — not one per unit."""
    for n_rows, bs, want in [(10, 4, 3), (16, 16, 1), (17, 16, 2), (3, 8, 1)]:
        ext = BatchLLMExtractor(prompt_batch_size=bs)
        rows = [("python", f"def f{i}(ctx):", f"r:f{i}.py", 0)
                for i in range(n_rows)]
        results = ext.extract_batch(rows)
        assert all(not isinstance(r, Exception) for r in results)
        assert ext.usage["n_requests"] == want, (n_rows, bs)


def test_batch_extractor_retries_transient_failures():
    ext = BatchLLMExtractor(
        transport_factory=partial(MockChatTransport, fail_every=3),
        prompt_batch_size=4, max_retries=2,
    )
    rows = [("python", f"def f{i}(ctx):", f"r:f{i}.py", 0) for i in range(10)]
    results = ext.extract_batch(rows)
    assert all(not isinstance(r, Exception) for r in results)
    assert [r[0][1] for r in results] == [f"f{i}" for i in range(10)]
    assert ext.usage["n_failures"] > 0  # failures happened and were retried
    # bounded: <= one call per chunk + one per-prompt success + failures
    n_chunks = 3
    assert ext.usage["n_requests"] <= n_chunks + 10 + ext.usage["n_failures"]


def test_transient_failures_never_quarantine_healthy_rows():
    """Dense transient faults (every 2nd distinct prompt 429s once) with
    a minimal retry budget: every row must still extract — retries resume
    at the failed prompt instead of burning the budget on completed ones,
    and the degrade path retries per-prompt rather than single-shot."""
    ext = BatchLLMExtractor(
        transport_factory=partial(MockChatTransport, fail_every=2),
        prompt_batch_size=4, max_retries=1,
    )
    rows = [("python", f"def f{i}(ctx):", f"r:f{i}.py", 0) for i in range(12)]
    results = ext.extract_batch(rows)
    assert all(not isinstance(r, Exception) for r in results), results
    assert [r[0][1] for r in results] == [f"f{i}" for i in range(12)]
    # completed prompts are not re-billed: total requests is bounded by
    # one call per chunk + one success per prompt + one per faulted prompt
    assert ext.usage["n_requests"] <= 3 + 12 + ext.usage["n_failures"]


def test_batch_extractor_isolates_poison_row():
    ext = BatchLLMExtractor(
        transport_factory=partial(MockChatTransport, poison_marker="POISON"),
        prompt_batch_size=8, max_retries=1,
    )
    rows = [("python", "def ok(ctx):", "r:a.py", 0),
            ("python", "POISON def bad(ctx):", "r:b.py", 0),
            ("python", "class Fine:", "r:c.py", 0)]
    results = ext.extract_batch(rows)
    assert results[0][0][1] == "ok"
    assert isinstance(results[1], TransportError)
    assert results[2][0][1] == "Fine"


def test_parse_reply_rejects_contract_violations():
    import json

    good = {"headers": ["pred", "obj", "kind", "line"],
            "satisfy": [], "data": {"pred": ["calls"], "obj": ["x"],
                                    "kind": ["symbol"], "line": [0]}}
    assert parse_reply(json.dumps(good)) == [("calls", "x", "symbol", 0)]
    bad_empty = dict(good, data={"pred": ["calls"], "obj": [""],
                                 "kind": ["symbol"], "line": [0]})
    with pytest.raises(ValueError):
        parse_reply(json.dumps(bad_empty))
    bad_ragged = dict(good, data={"pred": ["calls", "calls"], "obj": ["x"],
                                  "kind": ["symbol"], "line": [0]})
    with pytest.raises(ValueError):
        parse_reply(json.dumps(bad_ragged))


def test_llm_path_reproduces_golden_triples(spark, tmp_path):
    """e2e: the LLM-backed extraction stage reproduces the spec extractor's
    golden triples (P/R = 1.0 gate) and quarantines poisoned files."""
    from gondar_spark.config import JobConfig
    from gondar_spark.eval import precision_recall
    from gondar_spark.pipeline import Pipeline
    from gondar_spark.synth import SynthConfig, generate_source_df, golden_triples_df

    scfg = SynthConfig(n_files=60, seed=77)
    src = generate_source_df(spark, scfg, partitions=4)
    cfg = JobConfig(warehouse=str(tmp_path / "wh"), run_id="llm")
    ext = BatchLLMExtractor(tokens_per_min=10_000_000)  # budget never binds
    pipe = Pipeline(spark, cfg, batch_extractor=ext)
    pipe.run(source_df=src)

    golden = golden_triples_df(spark, scfg, 4)
    p, r = precision_recall(pipe.io.read("triples_raw"), golden)
    assert (p, r) == (1.0, 1.0)
    assert pipe.io.read("quarantine").count() == 0

    # poisoned corpus: the bad file quarantines, the rest still extract
    poison = spark.createDataFrame(
        [("org0/repo", "src/poison.py", "c0", "python", "POISON def x():")],
        ["repo", "path", "commit", "lang", "content"],
    )
    cfg2 = JobConfig(warehouse=str(tmp_path / "wh2"), run_id="llm2")
    ext2 = BatchLLMExtractor(
        transport_factory=partial(MockChatTransport, poison_marker="POISON"),
        max_retries=1,
    )
    pipe2 = Pipeline(spark, cfg2, batch_extractor=ext2)
    pipe2.run(source_df=src.unionByName(poison))
    quar = pipe2.io.read("quarantine")
    assert quar.count() == 1 and quar.first()["path"] == "src/poison.py"
    p2, r2 = precision_recall(pipe2.io.read("triples_raw"), golden)
    assert (p2, r2) == (1.0, 1.0)


def test_shared_limiter_is_per_process_per_budget():
    try:
        a = shared_limiter(4242)
        b = shared_limiter(4242)
        c = shared_limiter(9999)
        assert a is b and a is not c
        # two extractor instances (= two deserialized task closures) with
        # the same budget must draw from ONE window
        e1 = BatchLLMExtractor(tokens_per_min=4242)
        e2 = BatchLLMExtractor(tokens_per_min=4242)
        e1._ensure()
        e2._ensure()
        assert e1._limiter is e2._limiter
    finally:
        _SHARED_LIMITERS.pop(4242, None)
        _SHARED_LIMITERS.pop(9999, None)


def test_exact_tokenizer_paces_budget_by_real_counts():
    """With a fake exact tokenizer (flat 500 tokens/prompt) and a 1000
    tokens/min budget, the limiter must admit exactly two prompts per
    window and wait out the remainder before the third — pacing follows
    the REAL count, not the chars//4 heuristic (which would be tiny for
    these prompts and never wait)."""
    budget = 1000
    clock_now = [0.0]
    waits: list[float] = []

    def clock():
        return clock_now[0]

    def sleep(s):
        waits.append(s)
        clock_now[0] += s

    try:
        _SHARED_LIMITERS[budget] = TokenRateLimiter(
            budget, clock=clock, sleep=sleep
        )
        ext = BatchLLMExtractor(
            tokens_per_min=budget,
            prompt_batch_size=1,  # one acquire per prompt
            count_tokens=lambda messages: 500,
        )
        rows = [("python", f"def f{i}(ctx):", f"r:f{i}.py", 0)
                for i in range(4)]
        results = ext.extract_batch(rows)
        assert all(not isinstance(r, Exception) for r in results)
        # prompts 1+2 fill the window; 3 waits; 3+4 fill the next window
        assert len(waits) == 1 and waits[0] == pytest.approx(60.0)
        # heuristic path (default count_tokens=None) stays wait-free
        _SHARED_LIMITERS[budget] = TokenRateLimiter(
            budget, clock=clock, sleep=sleep
        )
        ext2 = BatchLLMExtractor(tokens_per_min=budget, prompt_batch_size=1)
        ext2.extract_batch(rows)
        assert len(waits) == 1  # no new waits
    finally:
        _SHARED_LIMITERS.pop(budget, None)


# ---------------------------------------------------------------- HTTP adapter
def _ok_body(content='{"x": 1}'):
    import json

    return json.dumps({
        "choices": [{"message": {"role": "assistant", "content": content}}],
        "usage": {"prompt_tokens": 7, "completion_tokens": 3},
    })


def test_http_transport_validates_config():
    with pytest.raises(ValueError):
        HttpChatTransport("ftp://nope", "key")
    with pytest.raises(ValueError):
        HttpChatTransport("https://ok.example/v1", "")


def test_http_transport_happy_path_posts_payload():
    import json

    calls = []

    def fake_post(url, headers, body, timeout_s):
        calls.append((url, headers, json.loads(body), timeout_s))
        return 200, _ok_body()

    t = HttpChatTransport("https://ep.example/v1/chat", "sk-test",
                          http_post=fake_post, timeout_s=300.0)
    reply = t.request([{"role": "user", "content": "hi"}], model="m",
                      temperature=0.0, seed=1001,
                      response_format={"type": "json_object"})
    assert reply["choices"][0]["message"]["content"] == '{"x": 1}'
    url, headers, payload, timeout_s = calls[0]
    assert url == "https://ep.example/v1/chat" and timeout_s == 300.0
    assert headers["Authorization"] == "Bearer sk-test"
    assert payload["temperature"] == 0.0 and payload["seed"] == 1001
    assert t.usage_prompt_tokens == 7 and t.usage_completion_tokens == 3


def test_http_transport_backs_off_on_429_then_succeeds():
    statuses = [429, 503, 200]
    slept: list[float] = []

    def fake_post(url, headers, body, timeout_s):
        s = statuses.pop(0)
        return (s, _ok_body() if s == 200 else "slow down")

    t = HttpChatTransport("https://ep.example/v1", "k", http_post=fake_post,
                          backoff_s=(1.0, 4.0), sleep=slept.append)
    reply = t.request([{"role": "user", "content": "x"}], model="m",
                      temperature=0.0, seed=1,
                      response_format={"type": "json_object"})
    assert reply["choices"]
    assert slept == [1.0, 4.0]  # exponential backoff, distinct from caller retry
    assert t.n_failures == 0  # transients resolved here never count


def test_http_transport_exhausted_backoff_and_hard_errors_raise():
    def always_429(url, headers, body, timeout_s):
        return 429, "rate limited"

    t = HttpChatTransport("https://ep.example/v1", "k", http_post=always_429,
                          backoff_s=(0.0,), sleep=lambda s: None)
    with pytest.raises(TransportError):
        t.request([{"role": "user", "content": "x"}], model="m",
                  temperature=0.0, seed=1,
                  response_format={"type": "json_object"})
    assert t.n_failures == 1

    def bad_request(url, headers, body, timeout_s):
        return 400, "schema error"

    t2 = HttpChatTransport("https://ep.example/v1", "k", http_post=bad_request,
                           backoff_s=(0.0,), sleep=lambda s: None)
    with pytest.raises(TransportError):  # non-transient: no retry loop
        t2.request([{"role": "user", "content": "x"}], model="m",
                   temperature=0.0, seed=1,
                   response_format={"type": "json_object"})

    def timeout_post(url, headers, body, timeout_s):
        raise OSError("read timed out")

    t3 = HttpChatTransport("https://ep.example/v1", "k", http_post=timeout_post,
                           backoff_s=(0.0,), sleep=lambda s: None)
    with pytest.raises(TransportError):
        t3.request([{"role": "user", "content": "x"}], model="m",
                   temperature=0.0, seed=1,
                   response_format={"type": "json_object"})


def test_estimate_tokens_positive():
    msgs = build_messages("x = f(y)", "r:p.py", "js", 2)
    assert estimate_tokens(msgs) >= len(msgs) * 4


def test_main_cli_exposes_llm_backend():
    import main as mainmod

    args = mainmod.parse_args(
        ["--extractor", "llm-mock", "--tokens-per-min", "5000"])
    assert args.extractor == "llm-mock" and args.tokens_per_min == 5000
    assert mainmod.parse_args([]).extractor == "spec"
