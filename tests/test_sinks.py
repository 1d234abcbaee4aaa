"""Resumable partitioned parquet export: shard-level commit protocol.

A killed export must resume processing only the uncommitted shards; a
finished export must be an idempotent no-op; everything must also work on
a filesystem without atomic rename (the object-store contract)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from vexor_ray.index.manifest import InjectedFault
from vexor_ray.index.storage import Store, no_rename_filesystem
from vexor_ray.sinks import export_parquet_resumable, read_exported


def _make_inputs(tmp_path, n_files=2, rows_per_file=100, rows_per_group=40):
    files = []
    for i in range(n_files):
        tbl = pa.table(
            {
                "val": pa.array(
                    [i * rows_per_file + j for j in range(rows_per_file)],
                    type=pa.int64(),
                ),
                "txt": pa.array([f"doc-{i}-{j}" for j in range(rows_per_file)]),
            }
        )
        p = tmp_path / f"in-{i:02d}.parquet"
        pq.write_table(tbl, p, row_group_size=rows_per_group)
        files.append(str(p))
    return files


def _transform(tbl: pa.Table) -> pa.Table:
    return tbl.append_column("doubled", pc.multiply(tbl.column("val"), 2))


def test_export_complete_and_values(ray_session, tmp_path):
    files = _make_inputs(tmp_path)
    out = tmp_path / "out"
    manifest = export_parquet_resumable(
        files, out, _transform, rows_per_shard=30
    )
    # 30-row shards split within 40/40/20 row groups -> 5 shards per file
    assert manifest["stats"]["shards"] == 10
    assert manifest["stats"]["rows"] == 200
    assert manifest["shards_this_run"] == 10
    got = read_exported(out).to_pandas().sort_values("val").reset_index(drop=True)
    assert len(got) == 200
    assert (got["doubled"] == got["val"] * 2).all()
    assert "doc_id" in got.columns  # lineage ids added


def test_export_kill_and_resume(ray_session, tmp_path):
    files = _make_inputs(tmp_path)
    out = tmp_path / "out"
    with pytest.raises(InjectedFault):
        export_parquet_resumable(
            files, out, _transform, rows_per_shard=30, fail_after_shards=3
        )
    # resume: exactly the remaining 7 shards process
    manifest = export_parquet_resumable(
        files, out, _transform, rows_per_shard=30
    )
    assert manifest["shards_this_run"] == 7
    assert manifest["stats"]["rows"] == 200
    got = read_exported(out).to_pandas().sort_values("val").reset_index(drop=True)
    assert len(got) == 200 and (got["doubled"] == got["val"] * 2).all()
    # idempotent third run: nothing to do
    again = export_parquet_resumable(files, out, _transform, rows_per_shard=30)
    assert again["shards_this_run"] == 0
    # GC left exactly one data object per shard
    store = Store.resolve(out, None)
    assert len(store.list_files("data", suffix=".parquet")) == 10


def test_export_kill_at_every_point(ray_session, tmp_path):
    """Whatever commit the kill lands after, resume completes the export
    with exactly the complement — and the final data is always identical."""
    files = _make_inputs(tmp_path, n_files=1, rows_per_file=100, rows_per_group=25)
    want = None
    for kill_after in range(1, 4):
        out = tmp_path / f"out-{kill_after}"
        with pytest.raises(InjectedFault):
            export_parquet_resumable(
                files, out, _transform, rows_per_shard=25,
                fail_after_shards=kill_after,
            )
        manifest = export_parquet_resumable(
            files, out, _transform, rows_per_shard=25
        )
        assert manifest["shards_this_run"] == 4 - kill_after
        got = (
            read_exported(out).to_pandas().sort_values("val").reset_index(drop=True)
        )
        if want is None:
            want = got
        else:
            assert got.equals(want)


def test_export_on_no_rename_filesystem(ray_session, tmp_path):
    files = _make_inputs(tmp_path, n_files=1, rows_per_file=50, rows_per_group=25)
    fs = no_rename_filesystem(tmp_path / "objstore")
    with pytest.raises(InjectedFault):
        export_parquet_resumable(
            files,
            "exports/run1",
            _transform,
            rows_per_shard=25,
            out_filesystem=fs,
            fail_after_shards=1,
        )
    manifest = export_parquet_resumable(
        files, "exports/run1", _transform, rows_per_shard=25, out_filesystem=fs
    )
    assert manifest["shards_this_run"] == 1
    got = (
        read_exported("exports/run1", out_filesystem=fs)
        .to_pandas()
        .sort_values("val")
        .reset_index(drop=True)
    )
    assert len(got) == 50 and (got["doubled"] == got["val"] * 2).all()


def test_export_column_pruning(ray_session, tmp_path):
    files = _make_inputs(tmp_path, n_files=1)
    out = tmp_path / "out"
    export_parquet_resumable(files, out, None, columns=["val"], rows_per_shard=64)
    got = read_exported(out).to_pandas()
    assert sorted(got.columns) == ["doc_id", "val"]
    assert len(got) == 100
