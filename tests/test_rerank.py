"""BM25L rerank arm: formula + fusion semantics (pure Python, no Ray)."""

from __future__ import annotations

import math

from vexor_ray.query.rerank import bm25l_scores, rerank_bm25l


def test_bm25l_hand_computed():
    docs = [["alpha", "beta"], ["alpha", "alpha", "gamma"], ["delta"]]
    scores = bm25l_scores(["alpha"], docs, k1=1.5, b=0.75, delta=0.5)
    n, avgdl = 3, 2.0
    idf = math.log((n + 1.0) / (2 + 0.5))

    def expect(tf, dl):
        ctd = tf / (1.0 - 0.75 + 0.75 * dl / avgdl)
        return idf * 2.5 * (ctd + 0.5) / (1.5 + ctd + 0.5)

    assert math.isclose(scores[0], expect(1, 2), rel_tol=1e-12)
    assert math.isclose(scores[1], expect(2, 3), rel_tol=1e-12)
    # tf=0 docs still earn the delta floor whenever the term appears in the
    # candidate corpus — rank_bm25.BM25L.get_scores parity
    assert math.isclose(scores[2], expect(0, 1), rel_tol=1e-12)
    # terms absent from the candidate corpus contribute nothing (idf.get → 0)
    assert bm25l_scores(["zeta"], docs) == [0.0, 0.0, 0.0]
    # positive idf even when df == n (the BM25L point)
    all_match = bm25l_scores(["alpha"], [["alpha"], ["alpha"]])
    assert all(s > 0 for s in all_match)


def test_rerank_fusion():
    cands = [
        {"doc_id": 1, "score": 1.0, "url": "https://x/aaa", "preview": "nothing here"},
        {"doc_id": 2, "score": 0.5, "url": "https://x/bbb", "preview": "quantum flux capacitor"},
        {"doc_id": 3, "score": 0.0, "url": "https://x/ccc", "preview": "other words entirely"},
    ]
    fused = rerank_bm25l("quantum flux capacitor", cands)
    # doc 2 is the only tf>0 match → bm25_norm 1.0 → fused 0.7*0.5 + 0.3 =
    # 0.65 < doc 1's 0.7 + delta-floor share → doc 1 first, doc 2 second
    assert [c["doc_id"] for c in fused] == [1, 2, 3]
    from vexor_ray.refimpl.bm25 import tokenize

    docs = [tokenize(f"{c['url']} {c['preview']}".strip()) for c in cands]
    bm = bm25l_scores(tokenize("quantum flux capacitor"), docs)
    assert bm[1] == max(bm) and bm[0] == bm[2] and bm[0] > 0
    by_id = {c["doc_id"]: c["score"] for c in fused}
    assert math.isclose(by_id[1], 0.7 * 1.0 + 0.3 * bm[0] / bm[1], rel_tol=1e-9)
    assert math.isclose(by_id[2], 0.7 * 0.5 + 0.3 * 1.0, rel_tol=1e-9)
    assert math.isclose(by_id[3], 0.3 * bm[2] / bm[1], rel_tol=1e-9)
    from vexor_ray.query.rerank import resolve_rerank_candidates
    assert resolve_rerank_candidates(5) == 20
    assert resolve_rerank_candidates(50) == 100
    assert resolve_rerank_candidates(100) == 150
    # empty query → unchanged order
    assert [c["doc_id"] for c in rerank_bm25l("!!!", cands)] == [1, 2, 3]
    assert rerank_bm25l("x", []) == []
