"""Block-max WAND: rank-identity vs the exact scorer and the oracle.

Two layers: (a) the 1k-page index with salted hot terms and score ties,
(b) randomized micro-corpora with tiny posting blocks so skipping, pivot
moves and block-max refinement all actually trigger.
"""

from __future__ import annotations

import math

import numpy as np

from vexor_ray.fixtures.pages import generate_queries
from vexor_ray.index import codec
from vexor_ray.query.searcher import Searcher
from vexor_ray.query.wand import block_max_wand
from vexor_ray.refimpl import bm25 as refbm25


def test_wand_rank_identity_fixture_queries(built_index, oracle_1k):
    out, _ = built_index
    s = Searcher(out)
    queries = generate_queries(120, seed=42)
    for q in queries:
        exact = s.search(q["query"], q["k"], method="exact")
        wand = s.search(q["query"], q["k"], method="wand")
        assert [d for d, _ in wand] == [d for d, _ in exact], q
        for (_, ws), (_, es) in zip(wand, exact):
            assert ws == es, q  # bit-identical scalar arithmetic


def _encode_corpus(docs: list[list[str]], block_size: int):
    """tokenized docs -> (chunks_by_term, doc_count, avg_doc_len, postings)."""
    postings: dict[str, list[tuple[int, int, int]]] = {}
    doc_lens = []
    for doc_id, tokens in enumerate(docs):
        tfs = refbm25.term_frequencies(tokens)
        doc_lens.append(len(tokens))
        for t, tf in tfs.items():
            postings.setdefault(t, []).append((doc_id, tf, len(tokens)))
    doc_count = len(docs)
    avgdl = sum(doc_lens) / doc_count if doc_count else 0.0
    chunks_by_term = {}
    for t, plist in postings.items():
        d = np.array([p[0] for p in plist], dtype=np.uint64)
        tf = np.array([p[1] for p in plist], dtype=np.uint64)
        dl = np.array([p[2] for p in plist], dtype=np.uint64)
        chunks_by_term[t] = [
            codec.encode_chunk(d, tf, dl, avgdl, block_size=block_size)
        ]
    return chunks_by_term, doc_count, avgdl, postings


def test_wand_randomized_vs_oracle():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    probs = 1.0 / np.arange(1, 41) ** 1.2
    probs /= probs.sum()
    for trial in range(30):
        n_docs = int(rng.integers(5, 120))
        docs = [
            list(rng.choice(vocab, size=int(rng.integers(1, 60)), p=probs))
            for _ in range(n_docs)
        ]
        block_size = int(rng.choice([2, 3, 4, 8]))  # tiny → many blocks
        chunks, n, avgdl, postings = _encode_corpus(docs, block_size)
        for _ in range(10):
            n_terms = int(rng.integers(1, 6))
            terms = list(
                dict.fromkeys(rng.choice(vocab + ["absent"], size=n_terms))
            )
            k = int(rng.choice([1, 3, 10, n]))
            expected = refbm25.top_k(
                refbm25.score_postings(terms, postings, n, avgdl), k
            )
            got = block_max_wand(
                terms, chunks, doc_count=n, avg_doc_len=avgdl, k=k, k1=1.5, b=0.75
            )
            assert [d for d, _ in got] == [d for d, _ in expected], (trial, terms, k)
            for (_, gs), (_, es) in zip(got, expected):
                assert math.isclose(gs, es, rel_tol=1e-12)


def test_wand_salted_chunks():
    """A term split into many doc-range chunks must score identically."""
    rng = np.random.default_rng(11)
    n = 200
    doc_ids = np.arange(n, dtype=np.uint64)
    tfs = rng.integers(1, 5, n).astype(np.uint64)
    dls = rng.integers(10, 100, n).astype(np.uint64)
    avgdl = float(dls.mean())
    whole = [codec.encode_chunk(doc_ids, tfs, dls, avgdl, block_size=4)]
    split = [
        codec.encode_chunk(
            doc_ids[s : s + 32], tfs[s : s + 32], dls[s : s + 32], avgdl, block_size=4
        )
        for s in range(0, n, 32)
    ]
    a = block_max_wand(
        ["t"], {"t": whole}, doc_count=n, avg_doc_len=avgdl, k=10, k1=1.5, b=0.75
    )
    b = block_max_wand(
        ["t"], {"t": split}, doc_count=n, avg_doc_len=avgdl, k=10, k1=1.5, b=0.75
    )
    assert a == b


def test_wand_empty_cases():
    assert block_max_wand([], {}, doc_count=10, avg_doc_len=5.0, k=10, k1=1.5, b=0.75) == []
    assert (
        block_max_wand(
            ["x"], {"x": []}, doc_count=10, avg_doc_len=5.0, k=10, k1=1.5, b=0.75
        )
        == []
    )
    chunks, n, avgdl, _ = _encode_corpus([["a", "b"], ["a"]], 2)
    assert block_max_wand(["a"], chunks, doc_count=n, avg_doc_len=avgdl, k=0, k1=1.5, b=0.75) == []


def test_wand_forced_drain_rank_identity(monkeypatch):
    """Force the drain fallback on every query shape and demand bit-identity.

    _DRAIN_CHECK=1 with an impossible skip-rate floor makes the very first
    main-loop iteration switch to the vectorized drain — mid-query states
    (heap partially full, cursors mid-block, salted chunks) all exercised by
    the randomized corpus.
    """
    import vexor_ray.query.wand as wand_mod

    monkeypatch.setattr(wand_mod, "_DRAIN_CHECK", 1)
    monkeypatch.setattr(wand_mod, "_DRAIN_MIN_SKIP", 2.0)
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(25)]
    probs = 1.0 / np.arange(1, 26) ** 1.1
    probs /= probs.sum()
    for trial in range(15):
        n_docs = int(rng.integers(5, 150))
        docs = [
            list(rng.choice(vocab, size=int(rng.integers(1, 50)), p=probs))
            for _ in range(n_docs)
        ]
        chunks, n, avgdl, postings = _encode_corpus(docs, int(rng.choice([2, 4, 8])))
        for _ in range(8):
            terms = list(
                dict.fromkeys(rng.choice(vocab + ["absent"], size=int(rng.integers(1, 6))))
            )
            k = int(rng.choice([1, 3, 10, n]))
            expected = refbm25.top_k(
                refbm25.score_postings(terms, postings, n, avgdl), k
            )
            got = block_max_wand(
                terms, chunks, doc_count=n, avg_doc_len=avgdl, k=k, k1=1.5, b=0.75
            )
            assert [d for d, _ in got] == [d for d, _ in expected], (trial, terms, k)
            for (_, gs), (_, es) in zip(got, expected):
                assert gs == es, (trial, terms, k)


def test_wand_mid_drain_rank_identity(monkeypatch):
    """Drain after a few real WAND iterations (partially-consumed cursors)."""
    import vexor_ray.query.wand as wand_mod

    monkeypatch.setattr(wand_mod, "_DRAIN_CHECK", 5)
    monkeypatch.setattr(wand_mod, "_DRAIN_MIN_SKIP", 2.0)
    rng = np.random.default_rng(29)
    vocab = [f"w{i}" for i in range(30)]
    probs = 1.0 / np.arange(1, 31) ** 1.3
    probs /= probs.sum()
    for trial in range(15):
        n_docs = int(rng.integers(20, 200))
        docs = [
            list(rng.choice(vocab, size=int(rng.integers(1, 40)), p=probs))
            for _ in range(n_docs)
        ]
        chunks, n, avgdl, postings = _encode_corpus(docs, 3)
        for _ in range(8):
            terms = list(
                dict.fromkeys(rng.choice(vocab, size=int(rng.integers(2, 6))))
            )
            expected = refbm25.top_k(
                refbm25.score_postings(terms, postings, n, avgdl), 10
            )
            got = block_max_wand(
                terms, chunks, doc_count=n, avg_doc_len=avgdl, k=10, k1=1.5, b=0.75
            )
            assert [d for d, _ in got] == [d for d, _ in expected], (trial, terms)
            for (_, gs), (_, es) in zip(got, expected):
                assert gs == es, (trial, terms)
