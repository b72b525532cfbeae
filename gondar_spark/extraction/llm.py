"""Batched LLM extraction backend behind the ``extractor`` seam (A14).

The reference's one expensive operator is a chat-completions client pinned
to determinism — JSON mode, temperature 0.0, seed 1001, max_retries 2,
timeout (/root/reference/gondar/modules/PubMedFlow.py:55-105) — plus a
token-per-minute envelope (/root/reference/gondar/utils/Flow.py:14). This
module reproduces that contract Spark-first:

  * ``BatchLLMExtractor`` runs INSIDE the mapInPandas stage: per Arrow
    micro-batch it assembles one 3-message prompt per unit
    (prompts.build_messages) and issues ONE ``request_batch`` transport
    call per prompt batch — request count = ceil(units /
    prompt_batch_size) on the happy path (micro-batched,
    partition-parallel — never a per-row driver loop), parses the JSON
    replies, and returns per-row fact tuples in the same shape the
    deterministic spec extractor emits — so retry / quarantine / metric
    machinery in operators/extract.py is shared unchanged.
  * ``TokenRateLimiter`` enforces tokens-per-minute per worker (the
    Flow.py:14 analog), shared process-wide via ``shared_limiter`` so
    every task a worker runs draws from ONE window (not one window per
    deserialized task closure): on a 1000-executor cluster each worker
    enforces budget/n_workers; clock and sleep are injectable so tests
    don't wait. The token counter is pluggable (``count_tokens=``) —
    default is the 4-chars heuristic; pass a real tokenizer for exact
    budgets against a production endpoint.
  * ``MockChatTransport`` is the deterministic stand-in endpoint (no
    network in this sandbox): it honors the JSON-mode message contract —
    replies derive ONLY from the message list — and supports fault
    injection to exercise the retry/quarantine path with real failures.
  * ``HttpChatTransport`` is the production adapter: endpoint/key
    validation and request timeout like the reference client
    (PubMedFlow.py:55-105, :74-75), exponential backoff on 429/5xx
    transient statuses (distinct from the caller's quarantine retries),
    and an injectable ``http_post`` so the adapter is fully testable
    against a fake socket — deployment is config, not code.

Transport contract: ``request_batch(batch, **kw) -> list[reply]`` takes a
LIST of prompt message-lists and returns one reply per prompt; it raises
if the whole call fails (how real batch endpoints behave). Failure
semantics downstream: a failed batch call is split into per-prompt calls
with bounded retries, so one poison row quarantines alone instead of
sinking its whole micro-batch (A15 — never silently drop, never
over-drop) and a batch failure never re-bills prompts that can succeed
alone.
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

    Known bypass, by design: a SINGLE request estimated larger than the
    whole per-minute budget is admitted at the start of a fresh window
    (``_spent == 0``) without waiting — blocking could never make room for
    it, so the alternative is deadlock. Such a request overdraws its
    window; the next acquire waits the full remainder.
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
    estimate for budgeting (±~30% vs a real tokenizer). Pass an exact
    tokenizer via BatchLLMExtractor(count_tokens=...) when budgeting
    against a production endpoint."""
    return sum(len(m["content"]) // 4 + 4 for m in messages)


# One rate window per (process, budget): Spark deserializes a fresh task
# closure per task, so limiter state held on the extractor instance would
# silently become a per-TASK window. Worker processes are reused across
# tasks; a module-level registry keyed by budget gives the per-WORKER
# window the budget math assumes.
_SHARED_LIMITERS: dict[int, TokenRateLimiter] = {}


def shared_limiter(tokens_per_min: int) -> TokenRateLimiter:
    lim = _SHARED_LIMITERS.get(tokens_per_min)
    if lim is None:
        lim = _SHARED_LIMITERS[tokens_per_min] = TokenRateLimiter(tokens_per_min)
    return lim


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
        """Single-prompt call (the degraded/retry path)."""
        self.n_requests += 1
        return self._reply(messages, temperature, response_format)

    def request_batch(self, batch: list[list[dict[str, str]]], *, model: str,
                      temperature: float, seed: int, response_format: dict,
                      max_tokens: int | None = None) -> list[dict]:
        """ONE billed request for a LIST of prompt message-lists. Any
        per-prompt fault (poison / fail_every) fails the WHOLE call —
        matching real batch-endpoint behavior; the caller splits the batch
        per-prompt to isolate the offender."""
        self.n_requests += 1
        return [self._reply(m, temperature, response_format) for m in batch]

    def _reply(self, messages: list[dict[str, str]], temperature: float,
               response_format: dict) -> dict:
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


class HttpChatTransport:
    """Chat-completions adapter for a real endpoint, offline-testable.

    Mirrors the reference client's deployment contract
    (/root/reference/gondar/modules/PubMedFlow.py:55-105): endpoint and
    API key are validated at construction, every request carries a hard
    timeout (the reference pins 300 s, :74-75), temperature/seed/JSON-mode
    ride the payload. Two failure classes are kept distinct:

      * transient HTTP statuses (429 / 5xx) are retried HERE with
        exponential backoff — connection pacing, invisible to the caller;
      * anything still failing (or a non-transient status) raises
        TransportError — the CALLER's bounded-retry/quarantine machinery
        (extract.py A15) owns that, so backoff never double-counts
        against the quarantine budget.

    ``http_post(url, headers, body_bytes, timeout_s) -> (status, body)``
    is injectable; tests drive the adapter with a fake socket, deployment
    passes nothing and gets the urllib default.

    Deliberately NO ``request_batch``: chat-completions endpoints take a
    single message list per call, so BatchLLMExtractor's unbatched path
    (exactly one billed call per prompt, per-prompt bounded retries) is
    the correct shape — a loop-based request_batch would discard and
    re-bill every already-successful prompt whenever a later prompt in
    the chunk failed. A provider with a REAL batch API subclasses and
    adds request_batch with that API's atomicity.

    IDEMPOTENCY: a network failure is ambiguous — a timeout AFTER the
    bytes left (read timeout, reset mid-reply) may mean the server
    completed the call, so auto-retrying it can double-bill a
    non-idempotent endpoint. ``retry_ambiguous=True`` (default) retries
    all OSErrors — correct for idempotent/seeded JSON-mode extraction,
    where a duplicate completion is wasted tokens but not wrong output.
    Set ``retry_ambiguous=False`` for endpoints where duplicates are
    unacceptable: timeouts/resets then raise TransportError immediately
    and the caller's quarantine path decides (pure connect-phase failures
    — ConnectionRefusedError, i.e. nothing ever reached the server — are
    still retried, since those are provably unbilled).
    """

    TRANSIENT = frozenset({429, 500, 502, 503, 504})

    def __init__(self, endpoint: str, api_key: str,
                 http_post: Callable | None = None,
                 timeout_s: float = 300.0,
                 backoff_s: tuple[float, ...] = (1.0, 4.0),
                 sleep: Callable[[float], None] = time.sleep,
                 retry_ambiguous: bool = True) -> None:
        if not endpoint.startswith(("http://", "https://")):
            raise ValueError(f"endpoint must be http(s), got: {endpoint!r}")
        if not api_key:
            raise ValueError("api_key must be non-empty")
        self.endpoint = endpoint
        self.api_key = api_key
        self.timeout_s = timeout_s
        self.backoff_s = backoff_s
        self._post = http_post or _urllib_post
        self._sleep = sleep
        self.retry_ambiguous = retry_ambiguous
        self.n_requests = 0
        self.n_failures = 0
        self.usage_prompt_tokens = 0
        self.usage_completion_tokens = 0

    def request(self, messages: list[dict[str, str]], *, model: str,
                temperature: float, seed: int, response_format: dict,
                max_tokens: int | None = None) -> dict:
        self.n_requests += 1
        payload = {
            "model": model,
            "messages": messages,
            "temperature": temperature,
            "seed": seed,
            "response_format": response_format,
        }
        if max_tokens is not None:
            payload["max_tokens"] = max_tokens
        body = json.dumps(payload).encode("utf-8")
        headers = {
            "Content-Type": "application/json",
            "Authorization": f"Bearer {self.api_key}",
        }
        last_err = None
        for attempt in range(len(self.backoff_s) + 1):
            if attempt > 0:
                self._sleep(self.backoff_s[attempt - 1])
            try:
                status, reply_body = self._post(
                    self.endpoint, headers, body, self.timeout_s
                )
            except OSError as e:
                # Provably unbilled — the TCP connect never succeeded, so
                # nothing reached the server. Always safe to retry. The
                # refusal may arrive bare or wrapped (urllib's URLError
                # carries it as .reason; _urllib_post unwraps, but a
                # custom http_post may not), so check both shapes.
                refused = isinstance(e, ConnectionRefusedError) or isinstance(
                    getattr(e, "reason", None), ConnectionRefusedError
                )
                if refused:
                    last_err = TransportError(f"connection refused: {e}")
                    continue
                # AMBIGUOUS: the server may have completed the call.
                if not self.retry_ambiguous:
                    self.n_failures += 1
                    raise TransportError(
                        f"ambiguous network failure (not retried, "
                        f"retry_ambiguous=False): {e}"
                    )
                last_err = TransportError(f"connection failure: {e}")
                continue
            if status == 200:
                doc = json.loads(reply_body)
                usage = doc.get("usage", {})
                self.usage_prompt_tokens += usage.get("prompt_tokens", 0)
                self.usage_completion_tokens += usage.get(
                    "completion_tokens", 0
                )
                return doc
            if status in self.TRANSIENT:
                last_err = TransportError(f"transient HTTP {status}")
                continue
            self.n_failures += 1
            raise TransportError(f"HTTP {status}: {reply_body[:200]!r}")
        self.n_failures += 1
        raise last_err


def _urllib_post(url: str, headers: dict, body: bytes,
                 timeout_s: float) -> tuple[int, str]:
    """Default http_post: stdlib urllib with a hard timeout (covers both
    connect and read). Kept trivially small — everything above it is
    tested against an injected fake.

    urllib wraps socket-level failures in URLError with the original
    exception as ``reason``; a wrapped ConnectionRefusedError is
    UNWRAPPED and re-raised as itself so the caller's provably-unbilled
    retry branch (``except ConnectionRefusedError``) actually sees it —
    the wrapper would otherwise land in the generic-OSError ambiguous
    branch and burn quarantine budget on a failure that never reached
    the server."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            return resp.status, resp.read().decode("utf-8")
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode("utf-8", "replace")
    except urllib.error.URLError as e:
        if isinstance(e.reason, ConnectionRefusedError):
            raise e.reason
        raise


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
                 prompt_batch_size: int = 16,
                 count_tokens: Callable[[list], int] | None = None) -> None:
        self.transport_factory = transport_factory
        self.model = model
        self.seed = seed
        self.max_retries = max_retries
        self.tokens_per_min = tokens_per_min
        self.prompt_batch_size = prompt_batch_size
        # pluggable tokenizer for the rate budget; None -> 4-chars heuristic
        self.count_tokens = count_tokens
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
                # process-wide window, NOT per task closure — worker reuse
                # across tasks must share one budget (see module docstring)
                self._limiter = shared_limiter(self.tokens_per_min)

    def _count(self, messages: list[dict[str, str]]) -> int:
        return (self.count_tokens or estimate_tokens)(messages)

    def _call_one(self, messages: list[dict[str, str]]) -> list:
        if self._limiter is not None:
            self._limiter.acquire(self._count(messages))
        reply = self._transport.request(
            messages, model=self.model, temperature=0.0, seed=self.seed,
            response_format={"type": "json_object"},
        )
        return parse_reply(reply["choices"][0]["message"]["content"])

    def _call_batch(self, chunk: list[list[dict[str, str]]]) -> list:
        """ONE transport call for a whole prompt chunk. Per-reply parse
        failures come back as None (only those rows re-run per-prompt);
        a whole-call failure propagates to the caller."""
        if self._limiter is not None:
            self._limiter.acquire(sum(self._count(m) for m in chunk))
        replies = self._transport.request_batch(
            chunk, model=self.model, temperature=0.0, seed=self.seed,
            response_format={"type": "json_object"},
        )
        out = []
        for reply in replies:
            try:
                out.append(parse_reply(reply["choices"][0]["message"]["content"]))
            except Exception:
                out.append(None)
        return out

    def extract_batch(self, rows: list[tuple[str, str, str, int]]
                      ) -> list[list | Exception]:
        """rows: (lang, unit, subj, base_chunk) -> per-row fact lists.
        A row whose extraction permanently fails yields its Exception in
        place of a fact list (the caller quarantines it).

        Happy path: ceil(len(rows) / prompt_batch_size) transport
        requests. A failed batch call is split straight into per-prompt
        bounded retries — never re-run wholesale, so completed prompts are
        never re-billed and one poison prompt quarantines alone (A15)."""
        self._ensure()
        prompts = [
            build_messages(unit, subj, lang, base_chunk)
            for lang, unit, subj, base_chunk in rows
        ]
        out: list[list | Exception] = [None] * len(rows)  # type: ignore
        batched = hasattr(self._transport, "request_batch")
        for start in range(0, len(prompts), self.prompt_batch_size):
            idx = list(range(start, min(start + self.prompt_batch_size,
                                        len(prompts))))
            if batched:
                try:
                    parsed = self._call_batch([prompts[i] for i in idx])
                    for i, facts in zip(idx, parsed):
                        if facts is not None:
                            out[i] = facts
                except Exception:
                    pass  # whole-call failure -> per-prompt isolation below
            # per-prompt bounded retries for anything the batch call did
            # not settle (or everything, on a transport without batching)
            for i in idx:
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
