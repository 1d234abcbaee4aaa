"""Remote rerank arm: score candidates via an external HTTP scorer with the
reference's retry/timeout discipline.

Re-implements, from scratch, the retry machinery of the reference's HTTP
provider (``vexor/providers/openai.py:117-163``): at most 2 retries after
the first attempt, exponential backoff 0.5 s → 4 s (factor 2, capped),
retry only on {408, 429, 5xx} or transport errors — any other status fails
fast.  The transport is an injected callable (``transport(payload) ->
(status, scores)``) so the policy is fully testable offline and a real HTTP
client can be dropped in where the environment allows network access.

Fusion semantics mirror the local BM25L arm (``query/rerank.py``):
remote scores are max-normalized and fused ``0.7*semantic + 0.3*remote``,
final order fused-desc (stable on ties).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence

MAX_RETRIES = 2
BACKOFF_INITIAL_S = 0.5
BACKOFF_CAP_S = 4.0
RETRYABLE_STATUSES = frozenset({408, 429}) | frozenset(range(500, 600))

Transport = Callable[[dict], tuple[int, Sequence[float] | None]]


class RemoteRerankError(RuntimeError):
    """Raised when the remote scorer fails after all retries."""


def call_with_retries(
    transport: Transport,
    payload: dict,
    *,
    max_retries: int = MAX_RETRIES,
    backoff_initial_s: float = BACKOFF_INITIAL_S,
    backoff_cap_s: float = BACKOFF_CAP_S,
    sleep: Callable[[float], None] = time.sleep,
) -> Sequence[float]:
    """Invoke ``transport`` with the reference's retry policy.

    Returns the scores on success; raises ``RemoteRerankError`` after the
    retry budget is spent or on a non-retryable status.
    """
    delay = backoff_initial_s
    last: str | None = None
    for attempt in range(max_retries + 1):
        try:
            status, scores = transport(payload)
        except Exception as exc:  # transport error → retryable
            status, scores = -1, None
            last = f"transport error: {exc}"
        else:
            if status == 200 and scores is not None:
                return scores
            last = f"status {status}"
            if status != -1 and status not in RETRYABLE_STATUSES:
                raise RemoteRerankError(
                    f"remote rerank failed (non-retryable {last})"
                )
        if attempt < max_retries:
            sleep(delay)
            delay = min(delay * 2.0, backoff_cap_s)
    raise RemoteRerankError(
        f"remote rerank failed after {max_retries + 1} attempts ({last})"
    )


def _normalize_by_max(scores: Sequence[float]) -> list[float]:
    mx = max(scores) if scores else 0.0
    if mx <= 0:
        return [0.0 for _ in scores]
    return [s / mx for s in scores]


def rerank_remote(
    query: str,
    candidates: list[dict],
    transport: Transport,
    *,
    semantic_weight: float = 0.7,
    sleep: Callable[[float], None] = time.sleep,
) -> list[dict]:
    """Fuse semantic scores with remote scores (reference fusion shape).

    ``candidates``: dicts with ``score`` (semantic) and a display document
    under ``url`` (+ optional ``preview``).  The transport receives one
    payload ``{"query": ..., "documents": [...]}`` and must return one
    score per document.
    """
    if not candidates:
        return []
    documents = [
        f"{c.get('url', '')} {c.get('preview') or ''}".strip() for c in candidates
    ]
    remote_scores = call_with_retries(
        transport, {"query": query, "documents": documents}, sleep=sleep
    )
    if len(remote_scores) != len(candidates):
        raise RemoteRerankError(
            f"remote scorer returned {len(remote_scores)} scores "
            f"for {len(candidates)} documents"
        )
    semantic = [max(float(c.get("score", 0.0)), 0.0) for c in candidates]
    sem_norm = _normalize_by_max(semantic)
    rem_norm = _normalize_by_max([max(float(s), 0.0) for s in remote_scores])
    fused = [
        {**c, "score": semantic_weight * sn + (1.0 - semantic_weight) * rn}
        for c, sn, rn in zip(candidates, sem_norm, rem_norm)
    ]
    fused.sort(key=lambda item: item["score"], reverse=True)
    return fused
