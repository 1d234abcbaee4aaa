"""Math-core contract tests (hand-computed values per FIXTURES.md §3)."""

from __future__ import annotations

import math

from vexor_ray.refimpl import bm25
from vexor_ray.spec import BM25_B, BM25_K1, MAX_QUERY_TERMS


def test_constants():
    assert BM25_K1 == 1.5
    assert BM25_B == 0.75
    assert MAX_QUERY_TERMS == 32


def test_tokenize_regex_path():
    # regex path: whole underscore identifiers are single tokens
    assert bm25.tokenize("_apply_bm25_rerank") == ["_apply_bm25_rerank"]
    assert bm25.tokenize("plain Config WORDS") == ["plain", "config", "words"]
    assert bm25.tokenize("中文测试") == []  # pure CJK yields nothing on regex path
    assert bm25.tokenize("!!!") == []
    assert bm25.tokenize("a-b c.d") == ["a", "b", "c", "d"]


def test_term_frequencies():
    assert bm25.term_frequencies(["alpha", "beta", "alpha"]) == {
        "alpha": 2,
        "beta": 1,
    }


def test_score_postings_matches_hand_computed_values():
    postings = {
        "alpha": [(0, 2, 3), (1, 1, 2)],
        "beta": [(1, 1, 2)],
    }
    scores = bm25.score_postings(["alpha", "beta"], postings, 3, 2.0)

    alpha_idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1)
    beta_idf = math.log((3 - 1 + 0.5) / (1 + 0.5) + 1)
    expected_zero = alpha_idf * 2 * 2.5 / (2 + 1.5 * (0.25 + 0.75 * 3 / 2))
    expected_one = alpha_idf + beta_idf
    assert math.isclose(scores[0], expected_zero, rel_tol=1e-12)
    assert math.isclose(scores[1], expected_one, rel_tol=1e-12)
    assert bm25.score_postings(["alpha"], postings, 3, 0.0) == {}
    assert bm25.score_postings(["alpha"], postings, 0, 2.0) == {}


def test_idf_non_negative():
    # even when df == N the non-negative Okapi variant stays > 0
    assert bm25.idf(100, 100) > 0.0
    assert bm25.idf(100, 1) > bm25.idf(100, 50)


def test_top_k_tie_break_doc_id_ascending():
    scores = {5: 1.0, 2: 1.0, 9: 2.0, 7: 0.5}
    assert bm25.top_k(scores, 3) == [(9, 2.0), (2, 1.0), (5, 1.0)]
    assert bm25.top_k(scores, 0) == []
    assert bm25.top_k({}, 5) == []


def test_preprocess_query_dedup_and_cap():
    assert bm25.preprocess_query("Alpha beta ALPHA gamma") == [
        "alpha",
        "beta",
        "gamma",
    ]
    many = " ".join(f"t{i}" for i in range(50))
    assert len(bm25.preprocess_query(many)) == 32
    assert bm25.preprocess_query("!!!") == []


def test_rrf_fuse_matches_reference_shape():
    fused = bm25.rrf_fuse([0, 1, 2], {0: 3.0, 2: 2.0}, 3)
    from vexor_ray.spec import RRF_BM25_WEIGHT, RRF_DENSE_WEIGHT, RRF_K

    expected_dense_only = RRF_DENSE_WEIGHT * (RRF_K + 1) / (RRF_K + 2)
    expected_row_two = RRF_DENSE_WEIGHT * (RRF_K + 1) / (RRF_K + 3) + (
        RRF_BM25_WEIGHT * (RRF_K + 1) / (RRF_K + 2)
    )
    assert fused[0] == 1.0
    assert math.isclose(fused[1], expected_dense_only, rel_tol=1e-6)
    assert math.isclose(fused[2], expected_row_two, rel_tol=1e-6)
    assert fused[2] > fused[1] > 0
