"""Resumable cross-store index replication (``index/clone.py``)."""

from __future__ import annotations

import pytest

from vexor_ray.fixtures.pages import generate_queries, write_pages
from vexor_ray.index.build import BuildConfig, build_index
from vexor_ray.index.clone import clone_index
from vexor_ray.index.storage import Store, no_rename_filesystem
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


@pytest.fixture(scope="module")
def clone_setup(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("clone")
    pages = write_pages(tmp / "pages", 200, seed=42, rows_per_file=100)
    idx = tmp / "idx"
    build_index(pages, idx, _cfg())
    # give the source a deletion ledger so the clone must carry it
    from vexor_ray.index.deletes import delete_docs

    s = Searcher(idx)
    urls = sorted(s._docs_ds.to_table(columns=["url"]).column("url").to_pylist())
    delete_docs(idx, urls[:5])
    return {"tmp": tmp, "pages": pages, "idx": idx}


def _results(s: Searcher, queries) -> list:
    out = []
    for q in queries:
        hits = s.search(q, k=50)
        urls = s.lookup_urls([d for d, _ in hits])
        out.append([(urls[d], sc) for d, sc in hits])
    return out


def test_clone_to_object_store_identical_results(clone_setup, tmp_path):
    dst = Store(no_rename_filesystem(tmp_path / "bucket"), "mirror")
    stats = clone_index(clone_setup["idx"], dst)
    assert stats["files_copied"] == stats["files_total"] > 0
    queries = [r["query"] for r in generate_queries(20, seed=5)]
    src_s = Searcher(clone_setup["idx"])
    dst_s = Searcher(dst)
    assert _results(src_s, queries) == _results(dst_s, queries)
    # tombstones travelled: live stats agree and deletions hold on the clone
    assert dst_s._has_tombs and dst_s.live_doc_count == src_s.live_doc_count


def test_clone_is_resumable_and_idempotent(clone_setup, tmp_path):
    dst = tmp_path / "mirror2"
    first = clone_index(clone_setup["idx"], dst)
    assert first["files_copied"] == first["files_total"]
    # second run copies nothing (every object already matches by size)
    again = clone_index(clone_setup["idx"], dst)
    assert again["files_copied"] == 0
    assert again["files_total"] == first["files_total"]


def test_clone_refuses_same_store(clone_setup):
    store = Store.resolve(clone_setup["idx"])
    with pytest.raises(ValueError, match="same store"):
        clone_index(store, store)


def test_clone_supports_incremental_build_and_purge(clone_setup, tmp_path):
    """The clone is a first-class index: compaction / purge keep working
    (records carry rewritten paths)."""
    from vexor_ray.index.deletes import purge_deletes

    dst = tmp_path / "mirror3"
    clone_index(clone_setup["idx"], dst)
    man = purge_deletes(clone_setup["pages"], dst, _cfg())
    assert man["deletes"]["n_deleted"] == 0
    s = Searcher(dst)
    assert not s._has_tombs and s.doc_count == 195
    src_s = Searcher(clone_setup["idx"])
    queries = [r["query"] for r in generate_queries(10, seed=5)]
    assert _results(s, queries) == _results(src_s, queries)


def test_clone_positions_sidecar(ray_session, tmp_path):
    from vexor_ray.index.positions import (
        PositionsConfig,
        PositionsIndex,
        build_positions_index,
    )

    pages = write_pages(tmp_path / "pages", 120, seed=7, rows_per_file=60)
    src = tmp_path / "pos"
    build_positions_index(
        pages,
        src,
        PositionsConfig(num_waves=2, partitions_per_wave=2, salt_shift=8),
    )
    dst = Store(no_rename_filesystem(tmp_path / "bucket"), "pos_mirror")
    stats = clone_index(src, dst)
    assert stats["files_copied"] == stats["files_total"] > 0
    a = PositionsIndex(src)
    b = PositionsIndex(dst)
    base = a.phrase_occurrences("retrieval engine")
    assert b.phrase_occurrences("retrieval engine").equals(base)


def test_clone_kill_mid_copy_resumes(clone_setup, tmp_path, monkeypatch):
    """A clone killed mid-transfer leaves NO committed manifest at the
    destination (invisible), and a rerun finishes from where it stopped."""
    import vexor_ray.index.clone as clone_mod
    from vexor_ray.index.manifest import manifest_exists

    real = clone_mod._copy_file
    calls = {"n": 0}

    def bomb(src, dst, sp, dp):
        if calls["n"] >= 5:
            raise RuntimeError("injected kill")
        calls["n"] += 1
        return real(src, dst, sp, dp)

    monkeypatch.setattr(clone_mod, "_copy_file", bomb)
    dst = tmp_path / "mirror_kill"
    with pytest.raises(RuntimeError, match="injected kill"):
        clone_index(clone_setup["idx"], dst)
    assert not manifest_exists(dst)  # partial copy is invisible

    monkeypatch.setattr(clone_mod, "_copy_file", real)
    stats = clone_index(clone_setup["idx"], dst)
    assert stats["files_copied"] == stats["files_total"] - 5  # resumed
    queries = [r["query"] for r in generate_queries(10, seed=5)]
    assert _results(Searcher(dst), queries) == _results(
        Searcher(clone_setup["idx"]), queries
    )


def test_clone_skips_stale_precompaction_snapshots(ray_session, tmp_path):
    """A retained snapshot whose data files were rewritten by compaction
    is unpinnable on the source; the clone must SKIP it (not crash) and
    still replicate the live state + any healthy snapshots."""
    import pyarrow.parquet as pq2

    from vexor_ray.fixtures.pages import generate_pages
    from vexor_ray.index.build import compact_index
    from vexor_ray.index.manifest import list_manifests

    pages = write_pages(tmp_path / "pages", 150, seed=9, rows_per_file=75)
    idx = tmp_path / "idx"
    build_index(pages, idx, _cfg())
    # mutate one shard → delta generation + second snapshot
    shards = sorted(pages.glob("part-*.parquet"))
    other = generate_pages(150, seed=33)
    pq2.write_table(other.slice(0, 75), shards[0])
    build_index(pages, idx, _cfg())
    # compaction rewrites generations: the pre-compaction snapshot now
    # references deleted data files
    compact_index(pages, idx)
    names = [m["name"] for m in list_manifests(idx)]
    assert len(names) >= 2
    dst = tmp_path / "mirror"
    stats = clone_index(idx, dst)  # must not raise
    queries = [r["query"] for r in generate_queries(8, seed=5)]
    assert _results(Searcher(dst), queries) == _results(Searcher(idx), queries)
