"""Checkpoint/resume: a killed build resumes without recomputation.

FIXTURES.md §5 contract: kill after N committed partitions → rerun must
(a) skip completed partitions, (b) produce an identical index (same segment
contents and manifest stats), (c) have lineage + metrics for every partition.
"""

from __future__ import annotations

import json

import pyarrow.dataset as pads
import pytest

from vexor_ray.fixtures.pages import write_pages
from vexor_ray.index.build import BuildConfig, build_index
from vexor_ray.index.manifest import InjectedFault
from vexor_ray.query.searcher import Searcher


def _cfg(**kw):
    base = dict(
        num_waves=2,
        partitions_per_wave=2,
        shard_group_size=1,
        tokenize_concurrency=2,
        salt_shift=8,
        # hash partitioning is deterministic per wave, so the resumed build's
        # segment files are byte-identical to an uninterrupted one (the sort
        # backend's range boundaries may legally differ between runs)
        shuffle_backend="hash",
    )
    base.update(kw)
    return BuildConfig(**base)


def test_kill_and_resume_identical(ray_session, tmp_path):
    pages = write_pages(tmp_path / "pages", 400, seed=42, rows_per_file=100)

    # reference: uninterrupted build
    ref_dir = tmp_path / "idx_ref"
    ref_manifest = build_index(pages, ref_dir, _cfg())

    # interrupted build: die after 3 partition commits (mid stage-1/2)
    idx_dir = tmp_path / "idx_resume"
    with pytest.raises(InjectedFault):
        build_index(pages, idx_dir, _cfg(fail_after_partitions=3))

    # no final manifest → index invisible to readers
    with pytest.raises(FileNotFoundError):
        Searcher(idx_dir)

    # resume: completed partitions must be skipped (their committed_at is
    # preserved), and the final index must match the uninterrupted one
    before = {
        p.name: json.loads(p.read_text())["committed_at"]
        for p in (idx_dir / "_manifest").glob("*.json")
    }
    manifest = build_index(pages, idx_dir, _cfg())
    after = {
        p.name: json.loads(p.read_text())["committed_at"]
        for p in (idx_dir / "_manifest").glob("*.json")
    }
    for name, ts in before.items():
        assert after[name] == ts, f"partition {name} was recomputed"
    assert len(after) > len(before)

    assert manifest["stats"] == ref_manifest["stats"]
    # identical logical segment contents (same rows, same encoded postings)
    for w in manifest["waves"]:
        got = (
            pads.dataset(manifest["waves"][w])
            .to_table()
            .sort_by([("term", "ascending"), ("salt", "ascending")])
        )
        want = (
            pads.dataset(ref_manifest["waves"][w])
            .to_table()
            .sort_by([("term", "ascending"), ("salt", "ascending")])
        )
        assert got.equals(want)

    # lineage + metrics present on every partition record
    for p in manifest["partitions"]:
        assert p["status"] == "done"
        assert p["metrics"], p["partition_id"]
        assert p["lineage"], p["partition_id"]
        assert p["input_fingerprint"]


def test_changed_input_invalidates_partition(ray_session, tmp_path):
    pages = write_pages(tmp_path / "pages", 200, seed=42, rows_per_file=100)
    idx_dir = tmp_path / "idx"
    build_index(pages, idx_dir, _cfg())
    # touch one input shard → its group (and downstream stages) must rebuild
    shard = sorted(pages.glob("part-*.parquet"))[0]
    shard.touch()
    rec_dir = idx_dir / "_manifest"
    old = {p.name: p.read_text() for p in rec_dir.glob("docs_tok--*.json")}
    build_index(pages, idx_dir, _cfg())
    new = {p.name: p.read_text() for p in rec_dir.glob("docs_tok--*.json")}
    changed = [n for n in old if old[n] != new[n]]
    assert len(changed) == 1  # exactly the touched shard's group
