"""Impact-ordered postings + Threshold-Algorithm scorer.

The impact layout (``BuildConfig.impact_postings=True``) is the opt-in
companion encoding for cold-selective top-k; the TA scorer over it must be
rank-identical to the exact scorer / oracle (same float association, same
(score desc, docID asc) tie-break), including under incremental builds
where gen-0 frontier bounds were encoded under a stale avgdl.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from vexor_ray.fixtures.pages import generate_pages, generate_queries, write_pages
from vexor_ray.index import codec
from vexor_ray.index.build import BuildConfig, build_index, encode_runs
from vexor_ray.query.searcher import Searcher
from vexor_ray.refimpl import search as oracle_search


# ---------------------------------------------------------------------------
# codec layer
# ---------------------------------------------------------------------------


def test_encode_impact_roundtrip():
    rng = np.random.default_rng(7)
    n = 1000
    docs = np.sort(rng.choice(np.arange(8 * n, dtype=np.uint64), n, replace=False))
    tfs = rng.integers(1, 40, n).astype(np.uint64)
    dls = rng.integers(1, 900, n).astype(np.uint64)
    avgdl = 217.3
    chunk = codec.encode_chunk(docs, tfs, dls, avgdl, block_size=64, impact=True)
    comp = codec.bm25_tf_component(tfs, dls, avgdl)
    by_doc = {int(d): (int(t), int(l)) for d, t, l in zip(docs, tfs, dls)}
    comp_by_doc = {int(d): c for d, c in zip(docs, comp)}

    out_docs, out_comp = [], []
    for b in range(codec.impact_n_blocks(chunk)):
        bd, bt, bl = codec.decode_impact_block(chunk, b)
        # every decoded posting carries its original (tf, dl)
        for d, t, l in zip(bd, bt, bl):
            assert by_doc[int(d)] == (int(t), int(l))
        bc = codec.bm25_tf_component(bt, bl, avgdl)
        # frontier bound covers the whole tail from this block on
        assert float(chunk["imp_cmax"][b]) >= bc.max() - 1e-12
        out_docs.extend(int(d) for d in bd)
        out_comp.extend(float(c) for c in bc)
    assert sorted(out_docs) == [int(d) for d in docs]  # complete permutation
    # globally descending component, ties broken by docID ascending
    for i in range(1, len(out_comp)):
        assert out_comp[i] <= out_comp[i - 1] + 1e-15
        if comp_by_doc[out_docs[i]] == comp_by_doc[out_docs[i - 1]]:
            assert out_docs[i] > out_docs[i - 1]
    # imp_cmax is non-increasing (frontier after block i bounds blocks > i)
    cmax = chunk["imp_cmax"]
    assert all(cmax[i + 1] <= cmax[i] for i in range(len(cmax) - 1))


def test_encode_runs_impact_matches_codec():
    from tests.test_encode_runs import _random_sorted_batch

    for seed, block_size in [(0, 128), (3, 5)]:
        batch = _random_sorted_batch(2000, 80, seed)
        out = encode_runs(
            batch,
            avg_doc_len=123.4,
            block_size=block_size,
            k1=1.5,
            b=0.75,
            impact=True,
        ).to_pylist()
        terms = batch.column("term").to_pylist()
        salts = batch.column("salt").to_pylist()
        docs = batch.column("doc_id").to_numpy()
        tfs = batch.column("tf").to_numpy()
        dls = batch.column("dl").to_numpy()
        runs: dict[tuple, list[int]] = {}
        for i, key in enumerate(zip(terms, salts)):
            runs.setdefault(key, []).append(i)
        by_key = {(r["term"], r["salt"]): r for r in out}
        for (t, s), idx in runs.items():
            idx = np.asarray(idx)
            order = np.argsort(docs[idx], kind="stable")
            ref = codec.encode_chunk(
                docs[idx][order].astype(np.uint64),
                tfs[idx][order].astype(np.uint64),
                dls[idx][order].astype(np.uint64),
                123.4,
                block_size=block_size,
                k1=1.5,
                b=0.75,
                impact=True,
            )
            got = by_key[(t, s)]
            assert got["imp_doc_blob"] == ref["imp_doc_blob"], (t, s)
            assert got["imp_tf_blob"] == ref["imp_tf_blob"], (t, s)
            assert got["imp_dl_blob"] == ref["imp_dl_blob"], (t, s)
            assert got["imp_doc_off"] == ref["imp_doc_off"].tolist(), (t, s)
            assert got["imp_tf_off"] == ref["imp_tf_off"].tolist(), (t, s)
            assert got["imp_dl_off"] == ref["imp_dl_off"].tolist(), (t, s)
            assert got["imp_cmax"] == ref["imp_cmax"].tolist(), (t, s)


# ---------------------------------------------------------------------------
# query layer
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def impact_index(ray_session, pages_1k, tmp_path_factory):
    """pages_1k index with the impact layout + aggressive salting/waves."""
    out = tmp_path_factory.mktemp("impact") / "idx_imp"
    cfg = BuildConfig(
        salt_shift=8,
        num_waves=2,
        partitions_per_wave=4,
        shard_group_size=2,
        tokenize_concurrency=2,
        impact_postings=True,
    )
    build_index(pages_1k, out, cfg)
    return out


def test_impact_rank_identity_all_fixture_queries(impact_index, oracle_1k):
    s = Searcher(impact_index)
    n_nonempty = 0
    for q in generate_queries(120, seed=42):
        expected = oracle_search(oracle_1k, q["query"], q["k"])
        got = s.search(q["query"], q["k"], method="impact")
        assert [d for d, _ in got] == [d for d, _ in expected], q
        for (_, gs), (_, es) in zip(got, expected):
            assert math.isclose(gs, es, rel_tol=1e-9), q
        n_nonempty += bool(expected)
    assert n_nonempty > 100


def test_impact_tie_break_pair(impact_index, oracle_1k, pages_1k):
    import pyarrow.dataset as pads

    s = Searcher(impact_index)
    tbl = pads.dataset(
        sorted(str(f) for f in pages_1k.glob("part-*.parquet"))
    ).to_table()
    term = tbl.column("text").to_pylist()[13].split()[3]
    dups = [
        d
        for d, u in oracle_1k.urls.items()
        if u.endswith("-00000013.html") or u.endswith("-00000014.html")
    ]
    results = s.search(term, k=oracle_1k.doc_count, method="impact")
    scores = {d: sc for d, sc in results}
    assert scores[dups[0]] == scores[dups[1]]
    ranks = {d: r for r, (d, _) in enumerate(results)}
    assert ranks[min(dups)] < ranks[max(dups)]


def test_auto_routes_selective_queries_to_impact(impact_index, monkeypatch):
    """With the layout present, auto sends cold-selective queries to TA."""
    import vexor_ray.query.impact as impact_mod

    calls = []
    real = impact_mod.impact_topk

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(impact_mod, "impact_topk", spy)
    s = Searcher(impact_index)
    # the 1k corpus is entirely under the cheap-decode bar; force the
    # volume branch so the selectivity routing itself is what's tested
    s.AUTO_WAND_MAX_POSTINGS = 0
    # rare needle + common companions: the selective WAND-class shape
    got_auto = s.search("needledftwo the and", k=10, method="auto")
    assert calls, "auto did not route the selective query to the impact arm"
    got_exact = s.search("needledftwo the and", k=10, method="exact")
    assert got_auto == got_exact


def test_impact_method_requires_layout(built_index):
    out, _ = built_index
    s = Searcher(out)
    with pytest.raises(ValueError, match="impact_postings"):
        s.search("needledftwo the", k=10, method="impact")


def test_impact_cache_upgrade_after_base_fetch(impact_index, oracle_1k):
    """A searcher that served an exact query first caches base-column
    chunks; a later impact query on the SAME terms must upgrade those
    entries to carry the imp_* payload (the lazy-projection regression)."""
    s = Searcher(impact_index)
    for q in ["needledften example", "needledfhundred the"]:
        first = s.search(q, 10, method="exact")  # populates base-only cache
        got = s.search(q, 10, method="impact")   # must upgrade, not KeyError
        expected = oracle_search(oracle_1k, q, 10)
        assert [d for d, _ in got] == [d for d, _ in expected], q
        assert [d for d, _ in first] == [d for d, _ in expected], q


def test_impact_split_run_overlapping_chunks():
    """A (term, salt) run split across sort-block boundaries yields chunks
    with INTERLEAVED doc ranges (encode_runs documents this as first-class);
    TA random access must probe every candidate chunk, not assume one owner
    per docID range — regression for the single-searchsorted version that
    silently dropped a term's contribution for docs in the 'wrong' chunk."""
    from vexor_ray.index import codec
    from vexor_ray.query.impact import impact_topk
    from vexor_ray.refimpl import bm25 as refbm25

    avgdl = 10.0
    n_docs = 200

    def chunk(docs, tfs, dls):
        return codec.encode_chunk(
            np.array(docs, dtype=np.uint64),
            np.array(tfs, dtype=np.uint64),
            np.array(dls, dtype=np.uint64),
            avgdl,
            block_size=2,
            impact=True,
        )

    # term y: one chunk.  term x: TWO fragments of one run, interleaved.
    chunks_by_term = {
        "x": [chunk([5, 100], [3, 1], [10, 10]), chunk([7, 50], [2, 5], [10, 10])],
        "y": [chunk([5, 7, 50], [4, 1, 2], [10, 10, 10])],
    }
    got = impact_topk(
        ["y", "x"],
        chunks_by_term,
        doc_count=n_docs,
        avg_doc_len=avgdl,
        k=10,
        k1=1.5,
        b=0.75,
    )
    postings = {
        "x": [(5, 3, 10), (7, 2, 10), (50, 5, 10), (100, 1, 10)],
        "y": [(5, 4, 10), (7, 1, 10), (50, 2, 10)],
    }
    exp = refbm25.top_k(
        refbm25.score_postings(["y", "x"], postings, n_docs, avgdl), 10
    )
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert math.isclose(gs, es, rel_tol=1e-12)


def test_impact_incremental_stale_avgdl(ray_session, tmp_path_factory):
    """Delta generations shift global avgdl; gen-0 impact frontiers must be
    conservatively rescaled (same rule as block_ub) so TA stays exact."""
    tmp = tmp_path_factory.mktemp("impact_incr")
    pages = write_pages(tmp / "pages", 400, seed=42, rows_per_file=100)

    def cfg():
        return BuildConfig(
            num_waves=2,
            partitions_per_wave=2,
            shard_group_size=1,
            tokenize_concurrency=2,
            salt_shift=8,
            shuffle_backend="hash",
            impact_postings=True,
        )

    idx = tmp / "idx"
    m0 = build_index(pages, idx, cfg())

    import pyarrow.parquet as pq

    shards = sorted(pages.glob("part-*.parquet"))
    other = generate_pages(120, seed=77)
    pq.write_table(other.slice(40, 60), shards[2])
    m1 = build_index(pages, idx, cfg())
    assert m1["stats"]["avg_doc_len"] != m0["stats"]["avg_doc_len"]

    s = Searcher(idx)
    n_checked = 0
    for q in generate_queries(60, seed=42):
        exact = s.search(q["query"], q["k"], method="exact")
        got = s.search(q["query"], q["k"], method="impact")
        assert [d for d, _ in got] == [d for d, _ in exact], q
        for (_, gs), (_, es) in zip(got, exact):
            assert math.isclose(gs, es, rel_tol=1e-12), q
        n_checked += bool(exact)
    assert n_checked > 40
