"""Anchor-text aggregation + BM25 anchor fusion (vexor_ray/functions/anchors.py).

The distributed one-shuffle (dst, term) count must be EXACTLY equal to a
dense single-process reference deriving the same md5 edges and sampled
anchor tokens — and the fusion must boost by exactly 1/4 per matching
in-link anchor on top of the 6dp-rounded BM25 score.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from vexor_ray.functions.anchors import anchor_counts_for_terms, anchor_terms
from vexor_ray.functions.dedup import md5_u64
from vexor_ray.spec import TOKEN_RE

SF = "/root/testdata/sf0.001"
D = 4


def _dense_reference() -> dict[tuple[int, str], int]:
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    n = len(ids)
    counts: dict[tuple[int, str], int] = {}
    for i, text in zip(ids, texts):
        toks = TOKEN_RE.findall(text.lower()) if text else []
        if not toks:
            continue
        for j in range(D):
            dst = md5_u64(f"pr|{i}|{j}".encode()) % n
            term = toks[md5_u64(f"anchor|{i}|{j}".encode()) % len(toks)]
            counts[(dst, term)] = counts.get((dst, term), 0) + 1
    return counts


def test_anchor_terms_exact_vs_dense_reference(ray_session):
    want = _dense_reference()
    got = anchor_terms(SF).to_pandas()
    have = {
        (int(d), t): int(c)
        for d, t, c in zip(got["dst"], got["term"], got["cnt"])
    }
    assert have == want


def test_anchor_counts_for_terms_matches_filtered_totals(ray_session):
    want = _dense_reference()
    terms = ["table", "query", "join"]
    totals: dict[int, int] = {}
    for (dst, term), c in want.items():
        if term in terms:
            totals[dst] = totals.get(dst, 0) + c
    dst, cnt = anchor_counts_for_terms(SF, terms)
    assert dst.tolist() == sorted(totals)
    assert cnt.tolist() == [totals[d] for d in sorted(totals)]
    assert (np.diff(dst) > 0).all()  # sorted, unique


def test_anchor_boosted_adds_quarter_per_hit(ray_session):
    from vexor_ray.pipelines.corpus import DocumentsSearcher, anchor_boosted_table
    from vexor_ray.pipelines.corpus import orig_ids_streamed

    query = "table query join"
    got = anchor_boosted_table(SF, query, k=10)
    # reference: exact BM25 scores + dense anchor totals
    s = DocumentsSearcher(SF)
    sr = s.searcher
    terms = sr.preprocess_query(query)
    iid, raw = sr._exact_scores(terms, sr.term_chunks(terms))
    ids = orig_ids_streamed(sr, iid)
    sc = np.round(raw, 6)
    want = _dense_reference()
    totals: dict[int, int] = {}
    for (dst, term), c in want.items():
        if term in terms:
            totals[dst] = totals.get(dst, 0) + c
    fused = sc + 0.25 * np.array([totals.get(int(d), 0) for d in ids])
    order = np.lexsort((ids, -fused))[:10]
    assert got.column("doc_id").to_numpy().tolist() == ids[order].tolist()
    assert np.array_equal(got.column("fused").to_numpy(), fused[order])
    # the boost must actually fire at this corpus size
    assert any(totals.get(int(d), 0) > 0 for d in got.column("doc_id").to_pylist())
