"""Transient-vs-permanent error taxonomy with bounded exponential backoff.

The reference classifies every failure before deciding whether to retry
(/root/reference/src/error.rs:221-245 ``is_transient``/``is_permanent``)
and retries transient ones under an exponential-backoff budget
(/root/reference/src/retry.rs:36-62 ``RetryConfig``: max_attempts,
initial/max delay, multiplier, max_duration, jitter). The Spark analog:
Spark's own task retry absorbs executor-level transients; THIS layer sits
above it, around whole micro-batches — a batch replay is idempotent (the
LSN fence skips already-applied work), so retrying a failed batch is always
safe, while a permanently corrupt frame directory or protocol stream must
fail fast with diagnostics instead of burning the backoff budget.

Classification (mirrors the reference's split):
- permanent: ``ProtocolError`` (corrupt/garbage WAL bytes — the
  reference's slot/auth class of unrecoverable errors), schema hard-misses
  (``AnalysisException``), and anything raised as ``PermanentError``.
- transient: OS/filesystem errors, timeouts, connection resets, Spark
  executor-loss / shuffle-fetch / Py4J network failures, and anything
  raised as ``TransientError``.
- unknown exceptions default to PERMANENT — retrying an unclassified
  failure hides bugs (the reference only retries enumerated variants).
"""

from __future__ import annotations

import time
from dataclasses import dataclass


class TransientError(Exception):
    """Explicitly retryable failure (reference: TransientConnection)."""


class PermanentError(Exception):
    """Explicitly unretryable failure (reference: PermanentConnection)."""


@dataclass
class RetryConfig:
    """Backoff budget (reference defaults: 5 attempts, 1s→60s, x2, 300s,
    jitter). Jitter is deterministic here (attempt-derived fraction) so
    replays stay reproducible."""

    max_attempts: int = 5
    initial_delay_s: float = 1.0
    max_delay_s: float = 60.0
    multiplier: float = 2.0
    max_duration_s: float = 300.0
    jitter: bool = True

    def delays(self):
        """Yield the delay before each retry (attempts 2..max_attempts)."""
        d = self.initial_delay_s
        for attempt in range(1, self.max_attempts):
            out = min(d, self.max_delay_s)
            if self.jitter:
                # deterministic +-12.5% spread keyed on the attempt number
                out *= 1.0 + 0.25 * (((attempt * 2654435761) % 256) / 255 - 0.5)
            yield out
            d *= self.multiplier


_TRANSIENT_TYPES = (TransientError, OSError, TimeoutError,
                    ConnectionError, InterruptedError)
# substrings that mark a Spark/Py4J failure as infrastructure-transient
_TRANSIENT_MARKERS = (
    "executorlostfailure", "fetchfailed", "shuffle", "connection reset",
    "connection refused", "timeout", "timed out", "temporarily unavailable",
    "no space left",  # spill-disk pressure: retry after compaction/cleanup
)
_PERMANENT_MARKERS = ("analysisexception", "protocolerror", "parseexception")


def _root_text(exc: BaseException) -> str:
    """Root-cause classification text: exception class + FIRST message line
    of the exception AND of every link of its cause chain. Py4JJavaError
    stringifies with the whole Java stack trace embedded — matching
    markers against that would misclassify a genuinely permanent failure
    as transient just because some frame in the trace mentions a
    shuffle/timeout. But classifying on the TOP exception alone misses
    the common Spark wrapper shape (``SparkException: Exception thrown in
    awaitResult:`` whose TimeoutException lives in getCause()) — so walk
    the Java getCause() chain and the Python __cause__ chain, taking
    class name + first message line of each."""
    parts: list[str] = []
    je = getattr(exc, "java_exception", None)
    if je is not None:
        try:
            seen = 0
            while je is not None and seen < 8:
                msg = (je.getMessage() or "").splitlines()
                parts.append(
                    f"{je.getClass().getName()}: {msg[0] if msg else ''}"
                )
                je = je.getCause()
                seen += 1
        except Exception:  # noqa: BLE001 — gateway may be gone; keep parts
            pass
    e: BaseException | None = exc
    seen = 0
    while e is not None and seen < 8:
        s = str(e).splitlines()
        parts.append(f"{type(e).__name__}: {s[0] if s else ''}")
        # walk only EXPLICIT `raise ... from ...` chains: an implicit
        # __context__ link is whatever unrelated exception happened to be
        # in flight when this one was raised — letting its text inject
        # transient/permanent markers can flip the retry decision
        e = e.__cause__
        seen += 1
    return " <- ".join(parts)


def classify_error(exc: BaseException) -> str:
    """'transient' | 'permanent' (the reference's is_transient/is_permanent
    split; unknowns are permanent — only enumerated failures retry)."""
    from .protocol.pyparser import ProtocolError

    if isinstance(exc, PermanentError) or isinstance(exc, ProtocolError):
        return "permanent"
    if isinstance(exc, _TRANSIENT_TYPES):
        return "transient"
    text = _root_text(exc).lower()
    if any(m in text for m in _PERMANENT_MARKERS):
        return "permanent"
    if any(m in text for m in _TRANSIENT_MARKERS):
        return "transient"
    return "permanent"


class RetryExhausted(Exception):
    def __init__(self, attempts: int, last: BaseException):
        super().__init__(
            f"transient failure persisted through {attempts} attempts: "
            f"{type(last).__name__}: {last}"
        )
        self.attempts = attempts
        self.last = last


def retry_call(fn, config: RetryConfig | None = None, *,
               classify=classify_error, on_retry=None,
               sleep=time.sleep):
    """Run ``fn()`` under the backoff budget. Permanent errors raise
    immediately; transient ones retry until attempts or the total-duration
    budget run out (then ``RetryExhausted``). ``on_retry(attempt, delay,
    exc)`` observes each retry (the engine logs it into batch metrics)."""
    cfg = config or RetryConfig()
    started = time.monotonic()
    last: BaseException | None = None
    delays = cfg.delays()
    for attempt in range(1, cfg.max_attempts + 1):
        try:
            return fn()
        except BaseException as exc:  # noqa: BLE001 — classified below
            if classify(exc) != "transient":
                raise
            last = exc
            if attempt >= cfg.max_attempts:
                break
            delay = next(delays)
            if time.monotonic() - started + delay > cfg.max_duration_s:
                break
            if on_retry is not None:
                on_retry(attempt, delay, exc)
            sleep(delay)
    raise RetryExhausted(attempt, last) from last
