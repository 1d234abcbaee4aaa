"""Object-store storage backend: every index protocol must run on a
filesystem WITHOUT rename (the S3/GCS contract).

``no_rename_filesystem`` is a real on-disk pyarrow filesystem (shared
across Ray workers) whose ``move`` and ``append`` raise — so any code path
still relying on an atomic rename fails loudly here.  Coverage per the
round-3 verdict's done-criteria: build → kill → resume → query → incremental
append → compact → streaming ingest, plus the pointer-swap manifest commit
unit contract.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vexor_ray.fixtures.pages import write_pages
from vexor_ray.index.build import BuildConfig, build_index, compact_index
from vexor_ray.index.manifest import (
    BuildManifest,
    InjectedFault,
    PartitionRecord,
    load_manifest,
    manifest_exists,
)
from vexor_ray.index.storage import Store, no_rename_filesystem
from vexor_ray.query.searcher import Searcher


def _cfg(**kw):
    base = dict(
        num_waves=2,
        partitions_per_wave=2,
        shard_group_size=1,
        tokenize_concurrency=2,
        salt_shift=8,
        shuffle_backend="hash",  # deterministic partitioning → byte parity
    )
    base.update(kw)
    return BuildConfig(**base)


def _upload(local_dir, store: Store) -> Store:
    """Copy local parquet shards into the object store, names preserved."""
    store.mkdirs()
    for f in sorted(local_dir.glob("*.parquet")):
        with store.fs.open_output_stream(store.path(f.name)) as out:
            out.write(f.read_bytes())
    return store


# ---------------------------------------------------------------------------
# filesystem + pointer-protocol unit contracts (no Ray needed)
# ---------------------------------------------------------------------------


def test_no_rename_fs_refuses_rename_and_append(tmp_path):
    fs = no_rename_filesystem(tmp_path)
    with fs.open_output_stream("a.txt") as f:
        f.write(b"x")
    with pytest.raises(NotImplementedError):
        fs.move("a.txt", "b.txt")
    with pytest.raises(NotImplementedError):
        fs.open_append_stream("a.txt")
    # and it is picklable with shared on-disk state (Ray-worker contract)
    import pickle

    fs2 = pickle.loads(pickle.dumps(fs))
    with fs2.open_input_stream("a.txt") as f:
        assert f.read() == b"x"


def test_pointer_swap_manifest_commit(tmp_path):
    store = Store(no_rename_filesystem(tmp_path), "idx")
    man = BuildManifest(store)
    man.commit_partition(
        PartitionRecord(stage="docs_tok", partition_id="group-00000",
                        input_fingerprint="fp0")
    )
    with pytest.raises(FileNotFoundError):
        load_manifest(store)  # records alone are not a commit
    assert not manifest_exists(store)

    out1 = man.finalize(config={"v": 1}, stats={"doc_count": 1})
    got = load_manifest(store)
    assert got["config"] == {"v": 1} and got["partitions"]
    # committed via pointer object, never a rename, no legacy name remotely
    assert store.exists("CURRENT")
    assert not store.exists("manifest.json")
    name1 = store.read_json("CURRENT")["manifest"]

    # second finalize swaps the pointer; the superseded manifest is
    # RETAINED as a pinnable snapshot (manifest_history default)
    man.finalize(config={"v": 2}, stats={"doc_count": 2})
    name2 = store.read_json("CURRENT")["manifest"]
    assert name2 != name1
    assert store.exists(name1)
    assert load_manifest(store)["config"] == {"v": 2}
    assert load_manifest(store, at=name1)["config"] == {"v": 1}
    from vexor_ray.index.manifest import list_manifests

    assert [e["seq"] for e in list_manifests(store)] == [0, 1]

    # keep_manifests=1 expires history down to the new commit
    man.finalize(config={"v": 3}, stats={"doc_count": 3}, keep_manifests=1)
    assert not store.exists(name1)
    assert not store.exists(name2)
    assert [e["seq"] for e in list_manifests(store)] == [2]

    # torn pointer PUT (undecodable) → loader falls back / raises cleanly
    with store.fs.open_output_stream(store.path("CURRENT")) as f:
        f.write(b'{"mani')  # torn
    with pytest.raises(FileNotFoundError):
        load_manifest(store)
    assert out1["format_version"]


def test_partition_records_tolerate_torn_put(tmp_path):
    store = Store(no_rename_filesystem(tmp_path), "idx")
    man = BuildManifest(store)
    man.commit_partition(
        PartitionRecord(stage="segments", partition_id="wave-0000-gen-0000",
                        input_fingerprint="fp")
    )
    # a crashed writer's partial record object must read as "absent"
    with store.fs.open_output_stream(
        store.path("_manifest/segments--zzz.json")
    ) as f:
        f.write(b'{"stage": "segm')
    recs = man.load_partitions()
    assert list(recs) == ["segments--wave-0000-gen-0000"]
    assert man.is_done("segments", "wave-0000-gen-0000", "fp")
    assert not man.is_done("segments", "wave-0000-gen-0000", "other-fp")


# ---------------------------------------------------------------------------
# end-to-end on the no-rename filesystem
# ---------------------------------------------------------------------------


@pytest.fixture()
def object_store(tmp_path):
    return no_rename_filesystem(tmp_path / "bucket")


def test_build_kill_resume_query_on_object_store(
    ray_session, tmp_path, object_store
):
    local_pages = write_pages(tmp_path / "pages", 300, seed=42, rows_per_file=100)
    pages = _upload(local_pages, Store(object_store, "pages"))
    idx = Store(object_store, "idx")

    # kill after 3 partition commits: no pointer → invisible to readers
    with pytest.raises(InjectedFault):
        build_index(pages, idx, _cfg(fail_after_partitions=3))
    with pytest.raises(FileNotFoundError):
        Searcher(idx)

    # resume skips completed partitions (committed_at preserved) and the
    # result matches a local-disk reference build bit-for-bit on queries
    man = BuildManifest(idx)
    before = {k: r.committed_at for k, r in man.load_partitions().items()}
    build_index(pages, idx, _cfg())
    after = {k: r.committed_at for k, r in man.load_partitions().items()}
    for k, ts in before.items():
        assert after[k] == ts, f"partition {k} was recomputed"

    ref_dir = tmp_path / "idx_ref"
    ref_manifest = build_index(local_pages, ref_dir, _cfg())
    assert load_manifest(idx)["stats"] == ref_manifest["stats"]

    s_os, s_ref = Searcher(idx), Searcher(ref_dir)
    for q in ["needledfone", "the of and a to", "common words", "qqqzzz"]:
        want = s_ref.search(q, k=10, method="exact")
        assert s_os.search(q, k=10, method="exact") == want
        assert s_os.search(q, k=10, method="wand") == want

    # federation across heterogeneous stores: one object-store shard + one
    # local shard in a single query (the sharded-100 TB shape) — the same
    # corpus twice, so the needle doc surfaces once per shard
    from vexor_ray.query.federate import FederatedSearcher

    fed = FederatedSearcher([idx, ref_dir])
    hits = fed.search("needledfone", k=4)  # (shard, doc_id, score)
    assert len(hits) == 2
    assert hits[0][1] == hits[1][1] and {hits[0][0], hits[1][0]} == {0, 1}


def test_incremental_append_and_compact_on_object_store(
    ray_session, tmp_path, object_store
):
    local_pages = write_pages(tmp_path / "pages", 200, seed=7, rows_per_file=100)
    pages = _upload(local_pages, Store(object_store, "pages"))
    idx = Store(object_store, "idx")
    # manifest_history=1: no snapshots retained, so compaction must leave
    # ONLY live dirs (snapshot-protected GC is covered in test_snapshots)
    _h1 = dict(manifest_history=1)
    build_index(pages, idx, _cfg(**_h1))
    n_gen0 = len(
        [p for p in load_manifest(idx)["partitions"] if p["stage"] == "segments"]
    )

    # append one shard sorting after the existing corpus → delta generation
    extra = write_pages(tmp_path / "extra", 150, seed=9, rows_per_file=150)
    src = sorted(extra.glob("*.parquet"))[0]
    with object_store.open_output_stream("pages/part-zz-append.parquet") as out:
        out.write(src.read_bytes())
    build_index(pages, idx, _cfg(**_h1))
    man = load_manifest(idx)
    seg_parts = [p for p in man["partitions"] if p["stage"] == "segments"]
    assert len(seg_parts) > n_gen0  # delta generations appended
    s = Searcher(idx)
    assert s.doc_count == 350

    # parity with a fresh build over the combined corpus
    fresh = Store(object_store, "idx_fresh")
    build_index(pages, fresh, _cfg())
    s_fresh = Searcher(fresh)
    for q in ["common words", "needledfone", "page"]:
        assert s.search(q, 10, method="exact") == s_fresh.search(
            q, 10, method="exact"
        )

    # compaction folds deltas into full generations and GCs superseded dirs
    compact_index(pages, idx, _cfg(**_h1))
    man2 = load_manifest(idx)
    for gens in man2["wave_gens"].values():
        assert len(gens) == 1 and gens[0]["full"]
    s.refresh()
    for q in ["common words", "needledfone"]:
        assert s.search(q, 10, method="exact") == s_fresh.search(
            q, 10, method="exact"
        )
    # superseded generation dirs are gone from the store
    live_dirs = {
        f.rsplit("/", 2)[-2]
        for gens in man2["wave_gens"].values()
        for g in gens
        for f in g["files"]
    }
    seg_store = Store(object_store, "idx/segments")
    assert set(seg_store.subdirs()) == live_dirs


def test_streaming_ingest_on_object_store(ray_session, object_store):
    from vexor_ray.streaming import StreamingIngestor

    cfg = BuildConfig(
        pre_extracted=True, doc_builder="text", num_waves=1,
        partitions_per_wave=2, shard_group_size=1, tokenize_concurrency=2,
        salt_shift=8,
    )
    us = 1_000_000

    def batch(tag, n, ts0):
        return pa.table(
            {
                "url": pa.array([f"{tag}/{i:03d}" for i in range(n)]),
                "text": pa.array(
                    [f"{tag} shared words row {i} needle{tag}" for i in range(n)]
                ),
                "warc_ts": pa.array(
                    [(ts0 + i) * us for i in range(n)], pa.timestamp("us")
                ),
            }
        )

    ing = StreamingIngestor(Store(object_store, "stream"), cfg)
    r1 = ing.ingest_batch(batch("one", 20, 1000))
    assert r1["watermark_us"] == (1000 + 19) * us
    s = ing.searcher()
    assert s.doc_count == 20 and s.search("needleone", 3)

    r2 = ing.ingest_batch(batch("two", 15, 2000))
    assert r2["watermark_us"] == (2000 + 14) * us
    s.refresh()
    assert s.doc_count == 35 and s.search("needletwo", 3)
    assert ing.recover() is None  # nothing orphaned

    # crash window: a shard landed but neither index nor state committed
    orphan = batch("three", 10, 3000)
    ing.pages.write_table_atomic(orphan, "batch-000000000099.parquet")
    assert ing.searcher().doc_count == 35  # still the old watermark
    r3 = ing.recover()
    assert r3 is not None and r3["adopted_orphans"] == 1
    s.refresh()
    assert s.doc_count == 45 and s.search("needlethree", 3)


def test_positions_sidecar_on_object_store(ray_session, tmp_path, object_store):
    """The positional sidecar shares the Store/manifest plumbing, so the
    whole lifecycle — build → kill → resume → query → incremental delta →
    compact — must run on the no-rename filesystem too."""
    from vexor_ray.index.positions import (
        PositionsConfig,
        PositionsIndex,
        build_positions_index,
        compact_positions_index,
    )

    local_pages = write_pages(tmp_path / "pages", 300, seed=42, rows_per_file=100)
    pages = _upload(local_pages, Store(object_store, "pages"))
    pos = Store(object_store, "pos")

    def cfg(**kw):
        return PositionsConfig(
            shard_group_size=1, num_waves=2, tokenize_concurrency=2, **kw
        )

    with pytest.raises(InjectedFault):
        build_positions_index(pages, pos, cfg(fail_after_partitions=2))
    with pytest.raises(FileNotFoundError):
        PositionsIndex(pos)

    man = BuildManifest(pos)
    before = {k: r.committed_at for k, r in man.load_partitions().items()}
    build_positions_index(pages, pos, cfg())
    after = {k: r.committed_at for k, r in man.load_partitions().items()}
    for k, ts in before.items():
        assert after[k] == ts, f"partition {k} was recomputed"

    ref_dir = tmp_path / "pos_ref"
    build_positions_index(local_pages, ref_dir, cfg())
    idx_os, idx_ref = PositionsIndex(pos), PositionsIndex(ref_dir)
    for ph in ["body html", "head title", "batch batch", "absent words"]:
        assert (
            idx_os.phrase_occurrences(ph).to_pydict()
            == idx_ref.phrase_occurrences(ph).to_pydict()
        ), ph

    # incremental delta on the object store: overwrite one shard object
    other_tbl = pq.read_table(sorted(local_pages.glob("part-*.parquet"))[0])
    shard1 = pages.list_files(suffix=".parquet")[1]
    with pages.fs.open_output_stream(shard1) as out:
        pq.write_table(other_tbl.slice(10, 50), out)
    man2 = build_positions_index(pages, pos, cfg())
    for w, gens in man2["pos_wave_gens"].items():
        assert [g["gen"] for g in gens] == [0, 1], w

    # compaction on the no-rename fs: one full generation, results stable
    want = PositionsIndex(pos).phrase_occurrences("body html").to_pydict()
    man3 = compact_positions_index(pages, pos)
    for w, gens in man3["pos_wave_gens"].items():
        assert len(gens) == 1 and gens[0]["full"], w
    assert PositionsIndex(pos).phrase_occurrences("body html").to_pydict() == want
