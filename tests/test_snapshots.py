"""Snapshot history / time-travel (index/manifest.py).

Each ``finalize`` commits ``manifest-<seq>-<nonce>.json`` and retains the
newest ``manifest_history`` snapshot objects; build/compaction GC skips
data directories any retained snapshot references
(``protected_data_dirs``), so a reader pinned to a previous snapshot
(``Searcher(manifest_name=...)``) sees the index exactly as of that commit
— the Iceberg-style reproducibility contract on the repo's own pointer
protocol.  When a snapshot expires from history, ``finalize`` sweeps the
data directories only it referenced.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from vexor_ray.fixtures.pages import generate_pages, write_pages
from vexor_ray.index.build import BuildConfig, build_index, compact_index
from vexor_ray.index.manifest import list_manifests, load_manifest
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
def snap_setup(ray_session, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("snap")
    pages = write_pages(tmp_path / "pages", 300, seed=42, rows_per_file=100)
    idx = tmp_path / "idx"
    build_index(pages, idx, _cfg())
    s0 = Searcher(idx)
    results_gen0 = s0.search("needledfone", k=10)
    count_gen0 = s0.doc_count
    snap0 = list_manifests(idx)[-1]["name"]

    # incremental append: one shard's content changes -> a delta generation
    shards = sorted(pages.glob("part-*.parquet"))
    other = generate_pages(160, seed=77)
    pq.write_table(other.slice(40, 80), shards[1])
    build_index(pages, idx, _cfg())
    return {
        "idx": idx,
        "pages": pages,
        "snap0": snap0,
        "results_gen0": results_gen0,
        "count_gen0": count_gen0,
    }


def test_history_lists_both_snapshots(snap_setup):
    hist = list_manifests(snap_setup["idx"])
    assert len(hist) == 2
    assert [h["seq"] for h in hist] == [0, 1]
    assert [h["current"] for h in hist] == [False, True]
    assert hist[0]["name"] == snap_setup["snap0"]


def test_pinned_searcher_sees_previous_generation(snap_setup):
    cur = Searcher(snap_setup["idx"])
    old = Searcher(snap_setup["idx"], manifest_name=snap_setup["snap0"])
    assert old.doc_count == snap_setup["count_gen0"]
    assert old.search("needledfone", k=10) == snap_setup["results_gen0"]
    # the current searcher reflects the appended generation
    assert cur.manifest["snapshot_seq"] == 1
    assert old.manifest["snapshot_seq"] == 0


def test_pinned_refresh_stays_pinned(snap_setup):
    old = Searcher(snap_setup["idx"], manifest_name=snap_setup["snap0"])
    old.refresh()
    assert old.manifest["snapshot_seq"] == 0
    assert old.doc_count == snap_setup["count_gen0"]


def test_load_manifest_at(snap_setup):
    man = load_manifest(snap_setup["idx"], at=snap_setup["snap0"])
    assert man["snapshot_seq"] == 0


def test_retention_prunes_oldest_and_sweeps_their_data(ray_session, tmp_path):
    from vexor_ray.index.manifest import manifest_data_dirs
    from vexor_ray.index.storage import Store

    pages = write_pages(tmp_path / "pages", 300, seed=3, rows_per_file=100)
    idx = tmp_path / "idx"
    cfg = _cfg(manifest_history=2)
    build_index(pages, idx, cfg)
    gen0_dirs = manifest_data_dirs(load_manifest(idx))
    shards = sorted(pages.glob("part-*.parquet"))
    for seed in (101, 102, 103):
        other = generate_pages(200, seed=seed)
        pq.write_table(other.slice(0, 100), shards[0])
        build_index(pages, idx, cfg)
    hist = list_manifests(idx)
    assert len(hist) == 2  # newest two retained
    assert hist[-1]["current"]
    assert hist[-1]["seq"] == 3
    # data referenced ONLY by expired snapshots was swept; data shared with
    # retained snapshots (unchanged shards' partitions) survives
    store = Store.resolve(idx)
    kept = set()
    for e in hist:
        kept |= manifest_data_dirs(load_manifest(idx, at=e["name"]))
    for d in gen0_dirs - kept:
        assert not store.exists_abs(d), d
    for d in kept:
        assert any(
            store.exists_abs(f)
            for f in [d]  # dir-level existence through the store
        )


def test_compaction_preserves_retained_snapshots(snap_setup):
    idx = snap_setup["idx"]
    hist_before = list_manifests(idx)
    # compaction itself commits snapshots (build + partition-list refresh):
    # a wide enough retention keeps the pre-compaction snapshot in history
    compact_index(snap_setup["pages"], idx, _cfg(manifest_history=6))
    cur = Searcher(idx)  # current snapshot opens and serves
    assert cur.search("needledfone", k=5)
    # every snapshot retained after compaction still opens and serves the
    # state as of its commit (old generations protected until expiry)
    old = Searcher(idx, manifest_name=hist_before[0]["name"])
    assert old.doc_count == snap_setup["count_gen0"]
    assert old.search("needledfone", k=10) == snap_setup["results_gen0"]


def test_pinned_snapshot_keeps_deletion_view(ray_session, tmp_path):
    """delete_docs commits a new snapshot; a reader pinned BEFORE the
    delete still sees the full corpus (its tombstone/ledger objects are
    protected while the snapshot is retained)."""
    from vexor_ray.index.deletes import delete_docs

    pages = write_pages(tmp_path / "pages", 200, seed=42, rows_per_file=100)
    idx = tmp_path / "idx"
    build_index(pages, idx, _cfg())
    pre = Searcher(idx)
    want = pre.search("needledfone", k=5)
    assert want, "needle must match before deletion"
    snap_pre = list_manifests(idx)[-1]["name"]
    url = pre.lookup_urls([want[0][0]])[want[0][0]]

    delete_docs(idx, [url])
    cur = Searcher(idx)
    assert all(d != want[0][0] for d, _ in cur.search("needledfone", k=5))

    pinned = Searcher(idx, manifest_name=snap_pre)
    assert pinned.search("needledfone", k=5) == want
    assert pinned.live_doc_count == 200 and cur.live_doc_count == 199


def test_snapshot_diff(snap_setup):
    """Diff between gen0 and gen1 equals the url-set difference of the
    underlying pages shards, reading only the changed group's files."""
    import pyarrow.parquet as _pq

    from vexor_ray.index.snapdiff import snapshot_diff

    idx = snap_setup["idx"]
    hist = list_manifests(idx)
    d = snapshot_diff(idx, hist[0]["name"], hist[1]["name"])
    # expected from the pages shards: shard 1 changed in snap_setup
    shards = sorted(snap_setup["pages"].glob("part-*.parquet"))
    new_shard = set(_pq.read_table(shards[1], columns=["url"])["url"].to_pylist())
    old_all = {f"{u}" for u in snap_setup_urls_gen0(snap_setup)}
    # recompute old shard-1 urls: gen0 total minus unchanged shards
    unchanged = set()
    for sh in shards:
        if sh != shards[1]:
            unchanged |= set(_pq.read_table(sh, columns=["url"])["url"].to_pylist())
    old_shard = old_all - unchanged
    assert d["added"] == len(new_shard - old_shard)
    assert d["removed"] == len(old_shard - new_shard)
    assert d["files_shared"] > 0  # unchanged groups were not read
    assert d["from"]["snapshot_seq"] == 0 and d["to"]["snapshot_seq"] == 1
    for u in d["added_sample"]:
        assert u in new_shard and u not in old_shard


def snap_setup_urls_gen0(snap_setup):
    """Url set of the gen0 snapshot via a pinned searcher's docs dataset."""
    s = Searcher(snap_setup["idx"], manifest_name=snap_setup["snap0"])
    urls = []
    for rb in s._docs_ds.to_batches(columns=["url"], batch_size=4096):
        urls.extend(rb.column("url").to_pylist())
    return set(urls)


def test_expire_snapshots_admin(ray_session, tmp_path):
    from vexor_ray.index.manifest import expire_snapshots, manifest_data_dirs
    from vexor_ray.index.storage import Store

    pages = write_pages(tmp_path / "pages", 300, seed=42, rows_per_file=100)
    idx = tmp_path / "idx"
    cfg = _cfg(manifest_history=10)
    build_index(pages, idx, cfg)
    gen0_dirs = manifest_data_dirs(load_manifest(idx))
    shards = sorted(pages.glob("part-*.parquet"))
    for seed in (101, 102):
        pq.write_table(generate_pages(200, seed=seed).slice(0, 100), shards[0])
        build_index(pages, idx, cfg)
    assert len(list_manifests(idx)) == 3

    res = expire_snapshots(idx, keep=1)
    hist = list_manifests(idx)
    assert len(hist) == 1 and hist[0]["current"]
    assert len(res["expired"]) == 2
    # current snapshot still serves; expired-only dirs swept
    s = Searcher(idx)
    assert s.search("needledfone", k=3)
    store = Store.resolve(idx)
    kept = manifest_data_dirs(load_manifest(idx))
    for d in gen0_dirs - kept:
        assert not store.exists_abs(d), d
    # idempotent
    assert expire_snapshots(idx, keep=1)["expired"] == []
