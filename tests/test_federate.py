"""Federated union query == single index over the concatenated corpus."""

from __future__ import annotations

import shutil

import pytest

from vexor_ray.fixtures.pages import generate_queries, write_pages
from vexor_ray.index.build import BuildConfig, build_index
from vexor_ray.query.federate import FederatedSearcher
from vexor_ray.query.searcher import Searcher


def _cfg(**kw):
    base = dict(
        num_waves=2,
        partitions_per_wave=2,
        shard_group_size=2,
        tokenize_concurrency=2,
        salt_shift=8,
    )
    base.update(kw)
    return BuildConfig(**base)


@pytest.fixture(scope="module")
def fed_setup(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fed")
    # two disjoint corpora (different seeds), plus their concatenation
    pages_a = write_pages(tmp / "pages_a", 200, seed=42, rows_per_file=100)
    pages_b = write_pages(tmp / "pages_b", 150, seed=99, rows_per_file=75)
    union_dir = tmp / "pages_union"
    union_dir.mkdir()
    # union file list = a's files then b's files (names force the order)
    for i, f in enumerate(sorted(pages_a.glob("part-*.parquet"))):
        shutil.copy(f, union_dir / f"part-a{i:05d}.parquet")
    for i, f in enumerate(sorted(pages_b.glob("part-*.parquet"))):
        shutil.copy(f, union_dir / f"part-b{i:05d}.parquet")

    idx_a, idx_b, idx_u = tmp / "idx_a", tmp / "idx_b", tmp / "idx_u"
    build_index(pages_a, idx_a, _cfg())
    build_index(pages_b, idx_b, _cfg())
    build_index(union_dir, idx_u, _cfg())
    return {
        "fed": FederatedSearcher([idx_a, idx_b]),
        "union": Searcher(idx_u),
    }


def test_global_stats_match_union(fed_setup):
    fed, union = fed_setup["fed"], fed_setup["union"]
    assert fed.doc_count == union.doc_count
    assert abs(fed.avg_doc_len - union.avg_doc_len) < 1e-12
    assert fed.df("the") == union.df("the")


def test_federated_scores_match_union_index(fed_setup):
    fed, union = fed_setup["fed"], fed_setup["union"]
    for q in generate_queries(30, seed=11):
        got = fed.search(q["query"], k=10, method="exact")
        want = union.search(q["query"], k=10, method="exact")
        # doc identity across the two builds is the url; scores must be
        # bit-identical (same global stats, same association order)
        got_urls = [
            (fed.searchers[idx].lookup_urls([d])[d], sc) for idx, d, sc in got
        ]
        want_urls = [
            (union.lookup_urls([d])[d], sc) for d, sc in want
        ]
        assert [u for u, _ in got_urls] == [u for u, _ in want_urls], q["query"]
        assert [s for _, s in got_urls] == [s for _, s in want_urls], q["query"]
        # WAND arm agrees with the exact arm under global stats
        got_wand = fed.search(q["query"], k=10, method="wand")
        assert got_wand == got, q["query"]


def test_config_mismatch_rejected(fed_setup, tmp_path, ray_session):
    pages = write_pages(tmp_path / "p", 150, seed=5, rows_per_file=150)
    idx = tmp_path / "idx_k1"
    build_index(pages, idx, _cfg(k1=2.0))
    with pytest.raises(ValueError, match="k1"):
        FederatedSearcher([fed_setup["fed"].searchers[0].index_dir, idx])


def test_serving_composition_smoke(ray_session, tmp_path_factory):
    """The README deployment story end to end: build + append (snapshot
    history) → clone to a serving store → QueryPool pinned to the OLD
    snapshot on the clone → snapshot-aware federation with a pinned
    member → analyzer guard still fires across it all."""
    from vexor_ray.index.clone import clone_index
    from vexor_ray.index.manifest import list_manifests
    from vexor_ray.query.server import QueryPool

    tmp = tmp_path_factory.mktemp("compose")
    pages_v1 = write_pages(tmp / "p1", 150, seed=3, rows_per_file=75)
    idx = tmp / "idx"
    build_index(pages_v1, idx, _cfg())
    s_v1_results = Searcher(idx).search("needledften needledfhundred", k=5)
    assert s_v1_results  # fixture needles guarantee matches

    # incremental append commits a second manifest (history retained)
    write_pages(tmp / "p1", 225, seed=3, rows_per_file=75)
    build_index(tmp / "p1", idx, _cfg())
    names = [m["name"] for m in list_manifests(idx)]
    assert len(names) >= 2
    old_name = names[-2]

    # clone carries the snapshot history to the serving store (non-current
    # snapshots keep their ORIGINAL names; the clone's current manifest is
    # its own commit)
    serve = tmp / "serve"
    clone_index(idx, serve)
    clone_names = [m["name"] for m in list_manifests(serve)]
    assert old_name in clone_names and len(clone_names) >= 2

    # pool pinned to the old snapshot answers exactly the v1 results,
    # even though CURRENT on the clone is the appended index
    pool = QueryPool(str(serve), num_workers=2, manifest_name=old_name)
    try:
        got = pool.search_many([{"query": "needledften needledfhundred", "k": 5}])[0]
        assert got == s_v1_results
        # unpinned pool sees the appended corpus (different doc_count path)
        live = QueryPool(str(serve), num_workers=1)
        try:
            live_got = live.search_many([{"query": "needledften needledfhundred", "k": 5}])[0]
            assert live_got == Searcher(idx).search("needledften needledfhundred", k=5)
        finally:
            live.shutdown()
    finally:
        pool.shutdown()

    # snapshot-aware federation: a pinned member composes with a live one
    pages_c = write_pages(tmp / "pc", 150, seed=77, rows_per_file=75)
    idx_c = tmp / "idx_c"
    build_index(pages_c, idx_c, _cfg())
    pinned = Searcher(serve, manifest_name=old_name)
    fed = FederatedSearcher([pinned, idx_c])
    assert fed.doc_count == pinned.live_doc_count + Searcher(idx_c).live_doc_count
    assert fed.search("needledften needledfhundred", k=5)

    # the analyzer guard refuses a mixed-analyzer member even when pinned
    idx_stop = tmp / "idx_stop"
    build_index(pages_c, idx_stop, _cfg(stop_words=["the"]))
    with pytest.raises(ValueError, match="stop_words"):
        FederatedSearcher([pinned, idx_stop])
