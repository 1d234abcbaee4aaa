"""BM25F field-weighted ranking (functions/bm25f.py).

The oracle gate (driver query ``bm25f_topk``) proves value parity with the
DuckDB twin; these tests pin the *semantics* the twin alone can't show —
the field weighting actually moves ranks, and the degenerate inputs are
handled like the reference's scorer (empty query / no matches → empty).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vexor_ray.functions.bm25f import bm25f_sql, bm25f_topk


@pytest.fixture(scope="module")
def field_corpus(tmp_path_factory):
    """Two docs, same length, same single query-term count — the term sits
    in the title field of doc 0 and in the body of doc 1."""
    filler = [f"filler{i}" for i in range(29)]
    # doc 0: term at position 0 (title field); doc 1: term at position 20
    d0 = ["needle"] + filler
    d1 = filler[:20] + ["needle"] + filler[20:]
    assert len(d0) == len(d1) == 30
    tmp = tmp_path_factory.mktemp("bm25f")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": pa.array([" ".join(d0), " ".join(d1)]),
            }
        ),
        tmp / "documents.parquet",
    )
    return str(tmp)


def test_title_hit_outranks_body_hit(ray_session, field_corpus):
    t = bm25f_topk(field_corpus, "needle", k=10)
    assert t.column("doc_id").to_pylist() == [0, 1]
    s = t.column("score").to_pylist()
    assert s[0] > s[1] > 0


def test_empty_query_and_no_match(ray_session, field_corpus):
    assert bm25f_topk(field_corpus, "", k=5).num_rows == 0
    assert bm25f_topk(field_corpus, "qqqzzzabsentterm", k=5).num_rows == 0


def test_matches_duckdb_twin_on_fixture(ray_session, field_corpus):
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{field_corpus}/documents.parquet')"
    )
    got = bm25f_topk(field_corpus, "needle filler3", k=10).to_pandas()
    want = con.execute(bm25f_sql(["needle", "filler3"], 10)).fetchdf()
    assert got.equals(want)


def test_short_docs_entirely_title(ray_session, tmp_path):
    """Docs shorter than HEAD_LEN have an empty body field (len_b=0):
    avgb=0 must not divide by zero and scoring still works."""
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": pa.array(["alpha beta", "beta gamma"]),
            }
        ),
        tmp_path / "documents.parquet",
    )
    t = bm25f_topk(str(tmp_path), "beta alpha", k=10)
    assert t.num_rows == 2
    assert t.column("doc_id").to_pylist()[0] == 0  # two hits beat one


def test_proximity_boost_orders_adjacent_terms_first(ray_session, tmp_path):
    """proximity_topk: same tf/df/length everywhere — only the distance
    between the two query terms differs, so ranking follows proximity."""
    from vexor_ray.pipelines.corpus import proximity_topk_table

    filler = [f"pad{i}" for i in range(28)]
    # alpha..beta distance 1 / 5 / 20 with identical doc length + tf
    def mk(dist):
        toks = list(filler)
        toks.insert(3, "alpha")
        toks.insert(3 + dist, "beta")
        return " ".join(toks)

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": pa.array([mk(20), mk(1), mk(5)]),
            }
        ),
        tmp_path / "documents.parquet",
    )
    t = proximity_topk_table(str(tmp_path), "alpha beta", k=3)
    assert t.column("doc_id").to_pylist() == [1, 2, 0]


def test_proximity_block_partial_is_capped_at_k(ray_session):
    """The scale contract of proximity_topk_table: each block emits at most
    k fused rows (the driver merges blocks×k partials, never the full
    (doc_id, mindist) match table)."""
    import numpy as np
    import ray as _ray

    from vexor_ray.pipelines.corpus import _ProximityBlockTopK
    from vexor_ray.spec import TOKEN_RE

    n, k = 40, 3
    ids = np.arange(n, dtype=np.int64)
    sc = np.round(np.linspace(1.0, 2.0, n), 6)
    fn = _ProximityBlockTopK(
        _ray.put((ids, sc)), {"alpha": 0, "beta": 1}, TOKEN_RE, 0.25, k
    )
    batch = pa.table(
        {
            "doc_id": pa.array(list(range(n)), type=pa.int64()),
            "text": pa.array([f"alpha pad{i} beta" for i in range(n)]),
        }
    )
    out = fn(batch)
    assert out.num_rows == k  # all 40 docs boosted, only k survive
    # the k rows are the top-k under (-fused, doc_id): highest base scores
    assert out.column("doc_id").to_pylist() == [n - 1, n - 2, n - 3]


def test_proximity_unboosted_doc_can_win(ray_session, tmp_path):
    """Merge correctness: a single-term doc (never boosted, so absent from
    every block partial) still outranks boosted docs when its base BM25
    exceeds their fused scores."""
    from vexor_ray.pipelines.corpus import proximity_topk_table

    pad = " ".join(f"pad{i}" for i in range(200))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                "text": pa.array(
                    [
                        "alpha alpha alpha",  # high tf, one term: unboosted
                        f"alpha beta {pad}",  # boosted, long → low base
                        f"alpha {pad} beta",  # boosted, long → low base
                        "beta",  # equalizes df(alpha)=df(beta)
                    ]
                ),
            }
        ),
        tmp_path / "documents.parquet",
    )
    t = proximity_topk_table(str(tmp_path), "alpha beta", k=4, weight=0.01)
    got = t.column("doc_id").to_pylist()
    assert set(got) == {0, 1, 2, 3}
    assert got[0] == 0  # unboosted high-tf doc wins the merge


def test_stopword_index_semantics(ray_session, tmp_path):
    """stop_words analyzer: stopped terms never match, don't count toward
    doc length, and the query side drops them identically."""
    import pyarrow.parquet as _pq

    from vexor_ray.index.build import BuildConfig, build_index
    from vexor_ray.query.searcher import Searcher

    rows = ["the alpha beta", "the the gamma alpha", "beta gamma delta"]
    pages = tmp_path / "pages"
    pages.mkdir()
    _pq.write_table(
        pa.table(
            {
                "url": pa.array([f"{i:03d}" for i in range(len(rows))]),
                "text": pa.array(rows).cast(pa.large_string()),
            }
        ),
        pages / "part-000.parquet",
    )
    idx = tmp_path / "idx"
    build_index(
        pages,
        idx,
        BuildConfig(
            pre_extracted=True, text_only=True, num_waves=1,
            partitions_per_wave=2, shard_group_size=1,
            tokenize_concurrency=2, stop_words=["the"],
        ),
    )
    s = Searcher(idx)
    assert s.search("the", k=5) == []  # stopped at query time too
    assert s.preprocess_query("the alpha") == ["alpha"]
    # doc lengths exclude 'the': total tokens = 2 + 2 + 3
    assert s.live_total_doc_len == 7
    assert s.df("the") == 0  # never indexed
    assert [d for d, _ in s.search("alpha", k=5)] != []


def test_stopword_positions_phrase(ray_session, tmp_path):
    """Positions sidecar built with the same stop_words list: phrase
    positions index the FILTERED token stream, so phrases spanning a
    removed stopword match ('alpha beta' in 'alpha the beta')."""
    import pyarrow.parquet as _pq

    from vexor_ray.index.positions import (
        PositionsConfig,
        PositionsIndex,
        build_positions_index,
    )

    pages = tmp_path / "pages"
    pages.mkdir()
    _pq.write_table(
        pa.table(
            {
                "url": pa.array(["000", "001"]),
                "text": pa.array(
                    ["alpha the beta gamma", "beta alpha delta"]
                ).cast(pa.large_string()),
            }
        ),
        pages / "part-000.parquet",
    )
    pos_dir = tmp_path / "pos"
    build_positions_index(
        pages,
        pos_dir,
        PositionsConfig(
            pre_extracted=True, num_waves=1, partitions_per_wave=2,
            shard_group_size=1, tokenize_concurrency=2, stop_words=["the"],
        ),
    )
    p = PositionsIndex(pos_dir)
    occ = p.phrase_occurrences("alpha beta")
    assert occ.num_rows == 1  # doc 0: 'the' removed -> alpha,beta adjacent
