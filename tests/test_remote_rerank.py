"""Remote rerank arm: retry/backoff policy + fusion (no network; injected
transport).  Policy contract per reference ``vexor/providers/openai.py:
117-163``: ≤2 retries, expo backoff 0.5→4 s, retry only {408, 429, 5xx} or
transport errors."""

from __future__ import annotations

import pytest

from vexor_ray.query.remote_rerank import (
    RemoteRerankError,
    call_with_retries,
    rerank_remote,
)


def _recording_sleep(log):
    def sleep(s):
        log.append(s)

    return sleep


def test_success_first_try():
    assert call_with_retries(lambda p: (200, [1.0, 2.0]), {}) == [1.0, 2.0]


def test_retry_on_5xx_then_success():
    calls, sleeps = [], []

    def transport(payload):
        calls.append(1)
        return (503, None) if len(calls) < 3 else (200, [0.5])

    out = call_with_retries(transport, {}, sleep=_recording_sleep(sleeps))
    assert out == [0.5]
    assert len(calls) == 3
    assert sleeps == [0.5, 1.0]  # exponential backoff from 0.5 s


def test_backoff_capped_and_budget_exhausted():
    sleeps = []
    with pytest.raises(RemoteRerankError, match="after 3 attempts"):
        call_with_retries(
            lambda p: (429, None), {}, sleep=_recording_sleep(sleeps)
        )
    assert sleeps == [0.5, 1.0]  # 2 retries → 2 sleeps


def test_non_retryable_fails_fast():
    calls = []

    def transport(payload):
        calls.append(1)
        return (401, None)

    with pytest.raises(RemoteRerankError, match="non-retryable"):
        call_with_retries(transport, {}, sleep=_recording_sleep([]))
    assert len(calls) == 1


def test_transport_exception_is_retryable():
    calls = []

    def transport(payload):
        calls.append(1)
        if len(calls) == 1:
            raise ConnectionError("boom")
        return (200, [1.0])

    assert call_with_retries(transport, {}, sleep=_recording_sleep([])) == [1.0]


def test_rerank_remote_fusion_and_payload():
    seen = {}

    def transport(payload):
        seen.update(payload)
        # doc 2 is the remote winner
        return (200, [0.1, 1.0, 0.4])

    cands = [
        {"doc_id": 1, "score": 1.0, "url": "u1", "preview": "p1"},
        {"doc_id": 2, "score": 0.5, "url": "u2", "preview": "p2"},
        {"doc_id": 3, "score": 0.0, "url": "u3", "preview": None},
    ]
    fused = rerank_remote("q", cands, transport, sleep=_recording_sleep([]))
    assert seen["query"] == "q"
    assert seen["documents"] == ["u1 p1", "u2 p2", "u3"]
    by_id = {c["doc_id"]: c["score"] for c in fused}
    assert by_id[1] == pytest.approx(0.7 * 1.0 + 0.3 * 0.1)
    assert by_id[2] == pytest.approx(0.7 * 0.5 + 0.3 * 1.0)
    assert by_id[3] == pytest.approx(0.3 * 0.4)
    assert [c["doc_id"] for c in fused] == [1, 2, 3]
    # score-count mismatch is an error
    with pytest.raises(RemoteRerankError, match="2 scores"):
        rerank_remote("q", cands, lambda p: (200, [1.0, 2.0]), sleep=_recording_sleep([]))
    assert rerank_remote("q", [], transport) == []
