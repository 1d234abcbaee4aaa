"""Pure-Python BM25 math core — the rank-identity contract.

Re-implements the reference's scoring semantics from scratch
(constants and formulas per SURVEY.md ⚠1-7; reference ``vexor/bm25.py``):

- tokenize: regex path ``[A-Za-z0-9_]+`` over lowercased text
  (``bm25.py:21,35-36``); the Bert pre-tokenizer path is an optional
  plug-in, not the deterministic default.
- document: ``f"{key} {text}"`` (``bm25.py:54-57``) — for web pages the key
  is the url, for bare corpora it is empty (text-only documents).
- IDF: non-negative Okapi ``ln((N - df + 0.5)/(df + 0.5) + 1)``
  (``bm25.py:80``).
- score: ``idf * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` summed per
  doc (``bm25.py:81-89``); empty result when ``doc_count <= 0`` or
  ``avg_doc_len <= 0`` (``bm25.py:72-73``).
- top-k tie-break: score descending then docID ascending
  (``services/search_service.py:176-182``).
- query terms: order-preserving dedup capped at ``MAX_QUERY_TERMS``
  (``bm25.py:19``, ``services/search_service.py:588-590``).
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Mapping, Sequence

from ..spec import BM25_B, BM25_K1, MAX_QUERY_TERMS, TOKEN_RE


def tokenize(text: str) -> list[str]:
    """Deterministic regex tokenizer: ``[A-Za-z0-9_]+`` of lowercased text."""
    return TOKEN_RE.findall(text.lower())


def build_document(key: str, text: str) -> str:
    """Canonical lexical document: ``"{key} {text}"`` (url + extracted text)."""
    return f"{key} {text}"


def term_frequencies(tokens: Sequence[str]) -> dict[str, int]:
    return dict(Counter(tokens))


def preprocess_query(query: str) -> list[str]:
    """Tokenize, dedup preserving order, cap at MAX_QUERY_TERMS."""
    terms = tokenize(query)
    return list(dict.fromkeys(terms))[:MAX_QUERY_TERMS]


def idf(doc_count: int, df: int) -> float:
    """Non-negative Okapi IDF."""
    return math.log((doc_count - df + 0.5) / (df + 0.5) + 1.0)


def score_postings(
    query_terms: Sequence[str],
    postings: Mapping[str, Sequence[tuple[int, int, int]]],
    doc_count: int,
    avg_doc_len: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> dict[int, float]:
    """Score posting lists ``term -> [(doc_id, tf, doc_len), ...]``.

    Callers must dedup query terms (duplicates double-count, matching the
    reference's contract).
    """
    if doc_count <= 0 or avg_doc_len <= 0:
        return {}
    scores: dict[int, float] = {}
    for term in query_terms:
        term_postings = postings.get(term, ())
        if not term_postings:
            continue
        df = len(term_postings)
        term_idf = math.log((doc_count - df + 0.5) / (df + 0.5) + 1.0)
        for doc_id, tf, doc_len in term_postings:
            denominator = tf + k1 * (1.0 - b + b * doc_len / avg_doc_len)
            if denominator <= 0:
                continue
            scores[doc_id] = scores.get(doc_id, 0.0) + (
                term_idf * tf * (k1 + 1.0) / denominator
            )
    return scores


def top_k(scores: Mapping[int, float], k: int) -> list[tuple[int, float]]:
    """Top-k scored docs ordered by (score desc, docID asc)."""
    if k <= 0:
        return []
    ranked = sorted(scores.items(), key=lambda item: (-item[1], item[0]))
    return ranked[:k]


def rrf_fuse(
    dense_order: Sequence[int],
    bm25_scores_by_row: Mapping[int, float],
    total_rows: int,
    *,
    k: int | None = None,
    dense_weight: float | None = None,
    bm25_weight: float | None = None,
) -> list[float]:
    """Weighted reciprocal-rank fusion of a dense ranking with BM25 scores.

    ``fused[row] += w_d*(k+1)/(k+rank)`` for every row in dense order, plus
    ``w_b*(k+1)/(k+rank)`` for rows with positive BM25 score ordered by
    (-score, row).  Accumulates in float32 like the reference.
    """
    from ..spec import RRF_BM25_WEIGHT, RRF_DENSE_WEIGHT, RRF_K

    import numpy as np

    kk = RRF_K if k is None else k
    wd = RRF_DENSE_WEIGHT if dense_weight is None else dense_weight
    wb = RRF_BM25_WEIGHT if bm25_weight is None else bm25_weight
    fused = np.zeros(total_rows, dtype=np.float32)
    for rank, row in enumerate(dense_order, start=1):
        if 0 <= row < total_rows:
            fused[row] += wd * (kk + 1.0) / (kk + rank)
    bm25_order = sorted(
        (
            (row, score)
            for row, score in bm25_scores_by_row.items()
            if score > 0 and 0 <= row < total_rows
        ),
        key=lambda item: (-item[1], item[0]),
    )
    for rank, (row, _score) in enumerate(bm25_order, start=1):
        fused[row] += wb * (kk + 1.0) / (kk + rank)
    return fused.tolist()
