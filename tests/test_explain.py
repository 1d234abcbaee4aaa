"""Searcher.explain: per-term breakdown sums bit-identically to search."""

from __future__ import annotations

import pytest

from vexor_ray.fixtures.pages import generate_queries, write_pages
from vexor_ray.index.build import BuildConfig, build_index
from vexor_ray.query.searcher import Searcher


@pytest.fixture(scope="module")
def exp_idx(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("explain")
    pages = write_pages(tmp / "pages", 300, seed=42, rows_per_file=100)
    idx = tmp / "idx"
    build_index(
        pages,
        idx,
        BuildConfig(
            num_waves=2, partitions_per_wave=2, shard_group_size=1,
            tokenize_concurrency=2, salt_shift=8,
        ),
    )
    return idx


def _check(s, queries):
    for q in queries:
        hits = s.search(q["query"], k=5, method="exact")
        for doc_id, score in hits:
            ex = s.explain(q["query"], doc_id)
            assert ex["score"] == score, (q["query"], doc_id)  # bit-exact
            assert abs(sum(t["contribution"] for t in ex["terms"]) - score) == 0
            for t in ex["terms"]:
                if t["tf"] > 0:
                    assert t["df"] > 0 and t["idf"] > 0 and t["doc_len"] > 0


def test_explain_sums_to_search_score(exp_idx):
    s = Searcher(exp_idx)
    _check(s, generate_queries(12, seed=5))


def test_explain_sharded_searcher(exp_idx):
    s = Searcher(exp_idx, max_dense_docs=16)  # force the sharded scorer
    assert s._sharded
    _check(s, generate_queries(8, seed=9))


def test_explain_absent_and_unknown(exp_idx):
    s = Searcher(exp_idx)
    ex = s.explain("qqqzzzabsentterm needledfone", 999_999_999)
    assert ex["score"] == 0.0
    assert [t["tf"] for t in ex["terms"]] == [0, 0]
    assert ex["terms"][0]["df"] == 0 and ex["terms"][1]["df"] == 1
    assert s.explain("", 0)["terms"] == []
