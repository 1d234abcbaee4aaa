"""Document deletion (tombstones) + physical purge.

Contract (``vexor_ray/index/deletes.py``): after ``delete_docs(idx, urls)``
every query answer is rank- AND score-identical to a fresh build over the
complement corpus (reference analogue: removed files disappear from the
index on the next update, ``vexor/cache.py:691-1009`` — here without
re-tokenizing anything); ``purge_deletes`` then makes it physical
(checkpoint/postings/urls gone from disk — the takedown guarantee) and the
ledger blocks resurrection through later rebuilds.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vexor_ray.fixtures.pages import generate_pages, generate_queries, write_pages
from vexor_ray.index.build import BuildConfig, build_index
from vexor_ray.index.deletes import delete_docs, purge_deletes
from vexor_ray.index.manifest import InjectedFault, load_manifest
from vexor_ray.query.searcher import Searcher


def _cfg(**kw):
    base = dict(
        num_waves=2,
        partitions_per_wave=2,
        shard_group_size=1,
        tokenize_concurrency=2,
        salt_shift=8,
        shuffle_backend="hash",
    )
    base.update(kw)
    return BuildConfig(**base)


N_PAGES = 300


@pytest.fixture(scope="module")
def del_setup(ray_session, tmp_path_factory):
    """One deleted index + the complement fresh build to compare against."""
    tmp = tmp_path_factory.mktemp("deletes")
    pages = write_pages(tmp / "pages", N_PAGES, seed=42, rows_per_file=100)
    idx = tmp / "idx"
    build_index(pages, idx, _cfg())

    s0 = Searcher(idx)
    all_urls = sorted(
        s0._docs_ds.to_table(columns=["url"]).column("url").to_pylist()
    )
    victims = all_urls[::7][:30]
    deletes = delete_docs(idx, victims)

    full = generate_pages(N_PAGES, seed=42)
    keep = pa.array(
        [u not in set(victims) for u in full.column("url").to_pylist()]
    )
    comp_pages = tmp / "pages_comp"
    comp_pages.mkdir()
    pq.write_table(full.filter(keep), comp_pages / "part-00000.parquet")
    comp_idx = tmp / "idx_comp"
    build_index(comp_pages, comp_idx, _cfg())
    return {
        "tmp": tmp,
        "pages": pages,
        "idx": idx,
        "comp_idx": comp_idx,
        "victims": victims,
        "deletes": deletes,
    }


def _url_results(searcher: Searcher, results) -> list[tuple[str, float]]:
    urls = searcher.lookup_urls([d for d, _ in results])
    return [(urls[d], sc) for d, sc in results]


def test_delete_commits_tombstones(del_setup):
    d = del_setup["deletes"]
    assert d["n_deleted"] == len(del_setup["victims"]) == d["n_urls"]
    assert d["deleted_total_len"] > 0
    man = load_manifest(del_setup["idx"])
    assert man["deletes"]["tomb"] is not None


def test_deleted_docs_never_surface(del_setup):
    s = Searcher(del_setup["idx"])
    victims = set(del_setup["victims"])
    for q in [r["query"] for r in generate_queries(40, seed=9)]:
        hits = _url_results(s, s.search(q, k=s.live_doc_count))
        assert not victims & {u for u, _ in hits}


def test_delete_matches_complement_fresh_build_bit_exact(del_setup):
    """Rank identity AND float score identity vs the complement build, for
    every fixture query, exact + auto arms, full result set."""
    s1 = Searcher(del_setup["idx"])
    s2 = Searcher(del_setup["comp_idx"])
    assert s1.live_doc_count == s2.doc_count
    assert s1.live_avg_doc_len == s2.avg_doc_len
    for q in [r["query"] for r in generate_queries(40, seed=9)]:
        for m in ("exact", "auto"):
            got = _url_results(s1, s1.search(q, k=200, method=m))
            want = _url_results(s2, s2.search(q, k=200, method="exact"))
            assert got == want, q  # urls AND float scores, bit-equal


def test_live_df_and_stats(del_setup):
    s1 = Searcher(del_setup["idx"])
    s2 = Searcher(del_setup["comp_idx"])
    assert s1.doc_count == N_PAGES  # physical stays as built
    for t in ("the", "retrieval", "needledftwo", "zzz_absent"):
        assert s1.df(t) == s2.df(t)


def test_wand_and_impact_raise_until_purged(del_setup):
    s = Searcher(del_setup["idx"])
    with pytest.raises(ValueError, match="pending deletions"):
        s.search("retrieval engine", k=5, method="wand")
    with pytest.raises(ValueError, match="pending deletions"):
        s.search("retrieval engine", k=5, method="impact")
    # auto silently routes to exact
    assert s.search("retrieval engine", k=5, method="auto") == s.search(
        "retrieval engine", k=5, method="exact"
    )


def test_boolean_and_hybrid_respect_deletions(del_setup):
    s1 = Searcher(del_setup["idx"])
    s2 = Searcher(del_setup["comp_idx"])
    got = _url_results(s1, s1.search_boolean(must=["retrieval"], should=["engine"], k=20))
    want = _url_results(s2, s2.search_boolean(must=["retrieval"], should=["engine"], k=20))
    assert got == want
    # hybrid: same dense order (by url) on both sides must fuse identically
    dense_urls = [u for u, _ in want][:10]
    inv1 = {u: d for d, u in s1.lookup_urls(
        [d for d, _ in s1.search("retrieval engine", k=50)]).items()}
    inv2 = {u: d for d, u in s2.lookup_urls(
        [d for d, _ in s2.search("retrieval engine", k=50)]).items()}
    order1 = [inv1[u] for u in dense_urls if u in inv1]
    order2 = [inv2[u] for u in dense_urls if u in inv2]
    h1 = _url_results(s1, s1.search_hybrid("retrieval engine", order1, k=10))
    h2 = _url_results(s2, s2.search_hybrid("retrieval engine", order2, k=10))
    assert h1 == h2


def test_msm_capped_out_seeding_respects_deletions(del_setup):
    """The round-5 min_should_match candidate union seeds docs from RAW
    capped-out should-term postings; tombstoned docs must be masked there
    too — results must equal the complement index's."""
    from vexor_ray.spec import MAX_QUERY_TERMS

    s1 = Searcher(del_setup["idx"])
    s2 = Searcher(del_setup["comp_idx"])
    # fillers occupy the whole scoring cap, the real term is capped out
    should = [f"zzqxabsent{i}" for i in range(MAX_QUERY_TERMS)] + ["html"]
    got = _url_results(
        s1, s1.search_boolean(should=should, k=300, min_should_match=1)
    )
    want = _url_results(
        s2, s2.search_boolean(should=should, k=300, min_should_match=1)
    )
    assert got == want
    assert want  # the term matches live docs (non-vacuous)


def test_delete_idempotent_and_cumulative(ray_session, tmp_path):
    pages = write_pages(tmp_path / "pages", 120, seed=7, rows_per_file=60)
    idx = tmp_path / "idx"
    build_index(pages, idx, _cfg())
    s = Searcher(idx)
    urls = sorted(
        s._docs_ds.to_table(columns=["url"]).column("url").to_pylist()
    )
    d1 = delete_docs(idx, urls[:5])
    assert d1["n_deleted"] == 5
    # re-deleting the same + never-indexed urls is a no-op
    d2 = delete_docs(idx, urls[:5] + ["https://nowhere.example/x.html"])
    assert d2["n_deleted"] == 5 and d2["n_urls"] == 6
    # a second batch accumulates
    d3 = delete_docs(idx, urls[5:9])
    assert d3["n_deleted"] == 9
    s2 = Searcher(idx)
    assert s2.live_doc_count == s2.doc_count - 9


def test_purge_makes_deletion_physical(del_setup, tmp_path):
    """Purge on a COPY of the deleted index: checkpoint rows gone, tombs
    cleared, WAND/impact usable again, results still bit-equal to the
    complement build, and a rebuild over the original source cannot
    resurrect the deleted urls (permanent ledger)."""
    import shutil

    idx = tmp_path / "idx_purge"
    shutil.copytree(del_setup["idx"], idx)
    man = purge_deletes(del_setup["pages"], idx, _cfg())
    assert man["deletes"]["n_deleted"] == 0
    assert man["deletes"]["tomb"] is None

    s1 = Searcher(idx)
    assert not s1._has_tombs
    assert s1.doc_count == s1.live_doc_count == N_PAGES - 30
    got_urls = set(
        s1._docs_ds.to_table(columns=["url"]).column("url").to_pylist()
    )
    assert not got_urls & set(del_setup["victims"])  # takedown: text gone

    s2 = Searcher(del_setup["comp_idx"])
    for q in [r["query"] for r in generate_queries(25, seed=9)]:
        for m in ("exact", "wand", "auto"):
            got = _url_results(s1, s1.search(q, k=100, method=m))
            want = _url_results(s2, s2.search(q, k=100, method="exact"))
            assert got == want, (q, m)

    # rebuild over the ORIGINAL (un-edited) source: ledger blocks resurrection
    build_index(del_setup["pages"], idx, _cfg())
    s3 = Searcher(idx)
    assert not s3._has_tombs
    got3 = set(
        s3._docs_ds.to_table(columns=["url"]).column("url").to_pylist()
    )
    assert not got3 & set(del_setup["victims"])
    assert s3.live_doc_count == N_PAGES - 30


def test_delete_then_incremental_update(ray_session, tmp_path):
    """Tombstones survive an incremental update that re-tokenizes a shard:
    re-indexed groups drop ledger urls physically, untouched groups stay
    covered by the re-resolved tombstones — results equal a fresh build
    over (updated corpus - deleted urls) exactly."""
    pages = write_pages(tmp_path / "pages", 300, seed=42, rows_per_file=100)
    idx = tmp_path / "idx"
    build_index(pages, idx, _cfg())
    s0 = Searcher(idx)
    urls = sorted(s0._docs_ds.to_table(columns=["url"]).column("url").to_pylist())
    # victims span all three shards, including the one we will re-tokenize
    victims = urls[::11][:20]
    delete_docs(idx, victims)

    # change shard 1's content, then incrementally update the deleted index
    shards = sorted((tmp_path / "pages").glob("part-*.parquet"))
    other = generate_pages(130, seed=77)
    pq.write_table(other.slice(10, 100), shards[1])
    build_index(pages, idx, _cfg())

    # fresh build over (current corpus minus victims)
    import pyarrow.dataset as pads

    cur = pads.dataset([str(p) for p in shards]).to_table()
    keep = pa.array([u not in set(victims) for u in cur.column("url").to_pylist()])
    comp_dir = tmp_path / "comp"
    comp_dir.mkdir()
    pq.write_table(cur.filter(keep), comp_dir / "part-00000.parquet")
    comp_idx = tmp_path / "idx_comp"
    build_index(comp_dir, comp_idx, _cfg())

    s1 = Searcher(idx)
    s2 = Searcher(comp_idx)
    assert s1.live_doc_count == s2.doc_count
    for q in [r["query"] for r in generate_queries(25, seed=3)]:
        got = _url_results(s1, s1.search(q, k=100))
        want = _url_results(s2, s2.search(q, k=100))
        assert got == want, q


def test_delete_on_object_store_fs(ray_session, tmp_path):
    """delete → query → purge → query on a filesystem with NO rename."""
    from vexor_ray.index.storage import Store, no_rename_filesystem

    fs = no_rename_filesystem(tmp_path / "bucket")
    pages = write_pages(tmp_path / "pages", 120, seed=7, rows_per_file=60)
    store = Store(fs, "idx")
    build_index(pages, store, _cfg())
    s0 = Searcher(store)
    urls = sorted(s0._docs_ds.to_table(columns=["url"]).column("url").to_pylist())
    victims = urls[::5][:10]
    d = delete_docs(store, victims)
    assert d["n_deleted"] == 10
    s1 = Searcher(store)
    assert s1.live_doc_count == s1.doc_count - 10
    hits = _url_results(s1, s1.search("retrieval engine", k=s1.live_doc_count))
    assert not set(victims) & {u for u, _ in hits}
    purge_deletes(pages, store, _cfg())
    s2 = Searcher(store)
    assert not s2._has_tombs and s2.doc_count == s1.doc_count - 10
    got = set(s2._docs_ds.to_table(columns=["url"]).column("url").to_pylist())
    assert not got & set(victims)
    assert s2.search("retrieval engine", k=5, method="wand") == s2.search(
        "retrieval engine", k=5, method="exact"
    )


def test_purge_kill_injection_resumes(ray_session, tmp_path):
    """A purge killed at any partition commit leaves the old index fully
    readable; rerunning finishes it with identical results."""
    pages = write_pages(tmp_path / "pages", 120, seed=7, rows_per_file=60)
    idx = tmp_path / "idx"
    build_index(pages, idx, _cfg())
    s0 = Searcher(idx)
    urls = sorted(s0._docs_ds.to_table(columns=["url"]).column("url").to_pylist())
    victims = urls[::5][:10]
    delete_docs(idx, victims)
    pre = Searcher(idx)
    pre_hits = _url_results(pre, pre.search("retrieval engine", k=50))

    # kill the purge's compaction mid-flight (fault injection counts
    # partition commits; the purge's own record commits happen first)
    with pytest.raises(InjectedFault):
        purge_deletes(pages, idx, _cfg(fail_after_partitions=3))
    # the previously committed index is still fully readable and correct
    mid = Searcher(idx)
    assert _url_results(mid, mid.search("retrieval engine", k=50)) == pre_hits

    purge_deletes(pages, idx, _cfg())
    s1 = Searcher(idx)
    assert not s1._has_tombs
    assert _url_results(s1, s1.search("retrieval engine", k=50)) == pre_hits
    got = set(s1._docs_ds.to_table(columns=["url"]).column("url").to_pylist())
    assert not got & set(victims)


def test_live_searcher_picks_up_deletes_on_refresh(ray_session, tmp_path):
    """A long-lived searcher serves the pre-delete view until refresh();
    after refresh it excludes the deleted docs (compaction-style hot swap)."""
    pages = write_pages(tmp_path / "pages", 120, seed=7, rows_per_file=60)
    idx = tmp_path / "idx"
    build_index(pages, idx, _cfg())
    s = Searcher(idx)
    # query by the corpus's highest-df term so matches are guaranteed
    vocab = s._dictionary_terms()
    qterm = max(vocab, key=lambda t: (vocab[t], t))
    before = s.search(qterm, k=s.doc_count)
    assert before
    victim = before[0][0]
    victim_url = s.lookup_urls([victim])[victim]
    delete_docs(idx, [victim_url])
    # stale view until refresh (searcher state is immutable per manifest)
    assert s.search(qterm, k=s.doc_count) == before
    s.refresh()
    after = s.search(qterm, k=s.live_doc_count)
    assert victim not in {d for d, _ in after}
    assert s.live_doc_count == s.doc_count - 1


def test_delete_parity_sharded_scorer(del_setup):
    """The salt-range-SHARDED exact path (max_dense_docs exceeded) applies
    the same tombstone masks + live stats — bit-equal to the complement."""
    s1 = Searcher(del_setup["idx"], max_dense_docs=64)
    assert s1._sharded
    s2 = Searcher(del_setup["comp_idx"])
    for q in [r["query"] for r in generate_queries(20, seed=9)]:
        got = _url_results(s1, s1.search(q, k=100, method="exact"))
        want = _url_results(s2, s2.search(q, k=100, method="exact"))
        assert got == want, q


def test_federated_with_tombstoned_member(del_setup, tmp_path):
    """Federation over [tombstoned A, B] equals federation over
    [complement-of-A, B]: live member stats + masked df feed the union
    scoring; the wand arm refuses."""
    from vexor_ray.query.federate import FederatedSearcher

    other_pages = write_pages(tmp_path / "other", 200, seed=99, rows_per_file=100)
    other_idx = tmp_path / "other_idx"
    build_index(other_pages, other_idx, _cfg())

    fed_del = FederatedSearcher([del_setup["idx"], other_idx])
    fed_cmp = FederatedSearcher([del_setup["comp_idx"], other_idx])
    assert fed_del.doc_count == fed_cmp.doc_count
    assert fed_del.avg_doc_len == fed_cmp.avg_doc_len
    for q in [r["query"] for r in generate_queries(15, seed=9)]:
        got = [
            (i, fed_del.searchers[i].lookup_urls([d])[d], sc)
            for i, d, sc in fed_del.search(q, k=30, method="exact")
        ]
        want = [
            (i, fed_cmp.searchers[i].lookup_urls([d])[d], sc)
            for i, d, sc in fed_cmp.search(q, k=30, method="exact")
        ]
        assert got == want, q
    with pytest.raises(ValueError, match="pending deletions"):
        fed_del.search("retrieval engine", k=5, method="wand")


def test_purge_on_byte_copied_index_never_deletes_source_files(
    del_setup, tmp_path
):
    """A byte-level copy (``cp -r`` instead of ``clone_index``) carries
    partition records whose absolute paths point into the SOURCE index.
    GC must treat those as foreign and skip them — purging the copy may
    not destroy a single file of the original (``Store.owns_abs``)."""
    import shutil

    from vexor_ray.index.storage import Store

    src = del_setup["idx"]
    before = {
        str(p.relative_to(src)) for p in src.rglob("*") if p.is_file()
    }
    probes = [r["query"] for r in generate_queries(10, seed=9)]
    want = [_url_results(Searcher(src), Searcher(src).search(q, k=20)) for q in probes]

    idx = tmp_path / "idx_bytecopy"
    shutil.copytree(src, idx)
    purge_deletes(del_setup["pages"], idx, _cfg())

    after = {str(p.relative_to(src)) for p in src.rglob("*") if p.is_file()}
    assert before - after == set(), "purge of a copy deleted source files"

    # the original index still opens and serves identically
    s = Searcher(src)
    got = [_url_results(s, s.search(q, k=20)) for q in probes]
    assert got == want

    # the guard itself
    st = Store.resolve(src)
    assert st.owns_abs(str(src / "docs_tok" / "x.parquet"))
    assert not st.owns_abs(str(idx / "docs_tok" / "x.parquet"))
    assert not st.owns_abs(str(src) + "_sibling/x.parquet")
