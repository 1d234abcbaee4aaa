"""BM25L candidate rerank arm — the reference's ``rerank="bm25"`` strategy.

Re-implements the reference's fusion (``services/search_service.py:199-218``)
from scratch: tokenize the query and each candidate's rerank document
(``"{name} {path} {preview}"`` → ours: ``"{url} {preview}"``), score with
BM25L over the candidate set only (BM25L per Lv & Zhai, CIKM 2011 — the
delta-shifted variant that avoids zero idf on tiny candidate sets; the
reference delegates to ``rank_bm25.BM25L`` with k1/b from the spec, delta =
0.5), normalize both the semantic and BM25 score lists by their max, and
fuse ``0.7 * sem + 0.3 * bm25``.  Final order: fused score descending,
stable (ties keep candidate order), truncated by the caller.
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Sequence

from ..refimpl.bm25 import tokenize
from ..spec import BM25_B, BM25_K1

FUSION_SEMANTIC_WEIGHT = 0.7
BM25L_DELTA = 0.5


def resolve_rerank_candidates(top_k: int) -> int:
    """Candidate pool for a rerank pass: ``max(20, min(2*k, 150))``
    (reference ``services/search_service.py:171-174``)."""
    return max(20, min(int(top_k * 2), 150))


def bm25l_scores(
    query_tokens: Sequence[str],
    documents: Sequence[Sequence[str]],
    k1: float = BM25_K1,
    b: float = BM25_B,
    delta: float = BM25L_DELTA,
) -> list[float]:
    """BM25L over a (small) candidate corpus: one score per document."""
    n = len(documents)
    if n == 0:
        return []
    doc_lens = [len(d) for d in documents]
    avgdl = sum(doc_lens) / n if n else 0.0
    dfs: Counter = Counter()
    tfs = [Counter(d) for d in documents]
    for tf in tfs:
        dfs.update(tf.keys())
    scores = [0.0] * n
    for term in query_tokens:
        df = dfs.get(term, 0)
        if df == 0:
            # rank_bm25's idf dict only holds corpus terms → missing terms
            # contribute 0 (BM25L.get_scores: ``self.idf.get(q) or 0``)
            continue
        idf = math.log((n + 1.0) / (df + 0.5))
        for i in range(n):
            # rank_bm25.BM25L adds idf*(k1+1)*(ctd+delta)/(k1+ctd+delta) for
            # EVERY doc — tf=0 included (ctd=0 → the delta floor) — whenever
            # the term appears anywhere in the candidate corpus
            tf = tfs[i].get(term, 0)
            ctd = (
                tf / (1.0 - b + b * doc_lens[i] / avgdl) if avgdl > 0 else 0.0
            )
            scores[i] += idf * (k1 + 1.0) * (ctd + delta) / (k1 + ctd + delta)
    return scores


def _normalize_by_max(scores: Sequence[float]) -> list[float]:
    if not scores:
        return []
    max_score = max(scores)
    if max_score <= 0:
        return [0.0 for _ in scores]
    return [s / max_score for s in scores]


def rerank_bm25l(
    query: str,
    candidates: list[dict],
) -> list[dict]:
    """Fuse semantic scores with BM25L over the candidates.

    ``candidates``: dicts with at least ``score`` (semantic) and a rerank
    document under ``url`` (+ optional ``preview``).  Returns NEW dicts with
    the fused score, sorted descending (stable on ties).
    """
    if not candidates:
        return []
    query_tokens = tokenize(query)
    if not query_tokens:
        return list(candidates)
    documents = [
        tokenize(f"{c.get('url', '')} {c.get('preview') or ''}".strip())
        for c in candidates
    ]
    bm25_scores = bm25l_scores(query_tokens, documents)
    semantic = [max(float(c.get("score", 0.0)), 0.0) for c in candidates]
    sem_norm = _normalize_by_max(semantic)
    bm25_norm = _normalize_by_max(bm25_scores)
    fused = [
        {**c, "score": FUSION_SEMANTIC_WEIGHT * s + (1.0 - FUSION_SEMANTIC_WEIGHT) * bsc}
        for c, s, bsc in zip(candidates, sem_norm, bm25_norm)
    ]
    fused.sort(key=lambda item: item["score"], reverse=True)
    return fused
