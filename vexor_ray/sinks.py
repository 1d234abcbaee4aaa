"""Resumable partitioned parquet export — the generic pipeline sink.

The 100 TB output discipline: an export is MANY parquet objects, one per
input shard (a bounded row range of one input file), never one giant
file.  Each shard's object is written under a unique attempt name and
becomes visible only when its partition record commits, so a killed run
re-processes exactly the uncommitted shards and a finished run is
idempotent.  All IO goes through ``index.storage.Store`` (``pyarrow.fs``),
so the same code commits correctly on a local disk, NFS, or an S3-class
object store with no atomic rename.

This applies the index build's commit protocol (reference analogue:
``vexor/cache.py:515-516`` ``BEGIN IMMEDIATE`` write atomicity) to
*pipeline outputs*: clean-corpus exports, training exports, scored
corpora — anything shaped "map over a parquet corpus, write a parquet
corpus".

Shards process inside one streaming Ray Data pipeline (``from_items`` over
the pending shard plan → ``map_batches``); records commit on the DRIVER as
result rows stream back, keeping the manifest single-writer.
"""

from __future__ import annotations

import json
import uuid
from pathlib import Path
from typing import Callable

import pyarrow as pa
import ray.data

from .index.manifest import BuildManifest, PartitionRecord
from .index.storage import Store
from .stages.docids import _open_parquet, plan_fragments

DATA_DIR = "data"
STAGE = "export"


def _shard_id(frag: dict) -> str:
    base = frag["doc_id_base"]
    return f"{base >> 32:05d}-{base & 0xFFFFFFFF:010d}"


def _fingerprint(frag: dict, file_sizes: dict[str, int]) -> str:
    return json.dumps(
        {
            "path": frag["path"],
            "rg": frag["row_group"],
            "off": frag["rg_offset"],
            "rows": frag["num_rows"],
            "size": file_sizes.get(frag["path"], -1),
        },
        sort_keys=True,
    )


class _ExportShard:
    """Reads one shard, applies the transform, writes one parquet object.

    Emits a single record row per shard; the data object is invisible to
    readers until the driver commits the record.
    """

    def __init__(self, transform, columns, store: Store, filesystem):
        self.transform = transform
        self.columns = columns
        self.store = store
        self.filesystem = filesystem

    def __call__(self, batch: pa.Table):
        import numpy as np

        for frag in batch.to_pylist():
            tbl = _open_parquet(frag["path"], self.filesystem).read_row_group(
                frag["row_group"], columns=self.columns
            )
            tbl = tbl.slice(frag["rg_offset"], frag["num_rows"])
            if "doc_id" not in tbl.column_names:
                ids = pa.array(
                    np.arange(
                        frag["doc_id_base"],
                        frag["doc_id_base"] + tbl.num_rows,
                        dtype=np.uint64,
                    ),
                    type=pa.uint64(),
                )
                tbl = tbl.add_column(0, "doc_id", ids)
            if self.transform is not None:
                tbl = self.transform(tbl)
            sid = _shard_id(frag)
            relpath = f"{DATA_DIR}/{sid}--{uuid.uuid4().hex[:8]}.parquet"
            full = self.store.write_table_atomic(tbl, relpath)
            yield pa.table(
                {
                    "shard_id": pa.array([sid]),
                    "output_file": pa.array([full]),
                    "rows": pa.array([tbl.num_rows], type=pa.int64()),
                }
            )


def export_parquet_resumable(
    input_files: list[str],
    out_uri: str | Path | Store,
    transform: Callable[[pa.Table], pa.Table] | None = None,
    *,
    columns: list[str] | None = None,
    rows_per_shard: int = 65536,
    filesystem=None,
    out_filesystem=None,
    concurrency: int | None = None,
    fail_after_shards: int | None = None,
) -> dict:
    """Export ``transform(read(input_files))`` as committed parquet shards.

    Returns the finalized manifest dict, extended with ``shards_this_run``
    (how many shards this invocation actually processed — 0 on a rerun of
    a finished export).  ``fail_after_shards`` is the kill-injection hook
    (raises after N commits; a rerun resumes).  ``columns`` prunes the
    input read to what the transform needs.
    """
    store = Store.resolve(out_uri, out_filesystem)
    store.sub(DATA_DIR).mkdirs()
    manifest = BuildManifest(store, fail_after_partitions=fail_after_shards)

    file_sizes: dict[str, int] = {}
    fs = filesystem
    for p in input_files:
        if fs is None:
            file_sizes[p] = Path(p).stat().st_size
        else:
            file_sizes[p] = fs.get_file_info(p).size

    frags = plan_fragments(
        sorted(input_files), rows_per_fragment=rows_per_shard, filesystem=fs
    )
    committed = manifest.load_partitions()
    pending = []
    fingerprints: dict[str, str] = {}
    kept_files: dict[str, str] = {}
    for frag in frags:
        sid = _shard_id(frag)
        fp = _fingerprint(frag, file_sizes)
        fingerprints[sid] = fp
        rec = committed.get(f"{STAGE}--{sid}")
        if (
            rec is not None
            and rec.status == "done"
            and rec.input_fingerprint == fp
            and all(store.exists_abs(f) for f in rec.output_files)
        ):
            kept_files[sid] = rec.output_files[0]
            continue
        pending.append(frag)

    shards_this_run = 0
    if pending:
        ds = ray.data.from_items(pending)
        worker = _ExportShard(transform, columns, store, fs)
        kwargs: dict = {"batch_size": 1, "batch_format": "pyarrow"}
        if concurrency is not None:
            kwargs["concurrency"] = concurrency
        results = ds.map_batches(worker, **kwargs)
        # records commit on the driver, in arrival order: one tiny row per
        # shard, never corpus-sized
        for rb in results.iter_batches(batch_size=256, batch_format="pyarrow"):
            for sid, out_file, rows in zip(
                rb.column("shard_id").to_pylist(),
                rb.column("output_file").to_pylist(),
                rb.column("rows").to_pylist(),
            ):
                manifest.commit_partition(
                    PartitionRecord(
                        stage=STAGE,
                        partition_id=sid,
                        input_fingerprint=fingerprints[sid],
                        output_files=[out_file],
                        metrics={"rows": rows},
                    )
                )
                kept_files[sid] = out_file
                shards_this_run += 1

    # GC: delete data objects not referenced by any committed record
    # (crashed attempts, superseded re-runs) — idempotent, crash-safe
    referenced = {f.rsplit("/", 1)[-1] for f in kept_files.values()}
    for f in store.list_files(DATA_DIR, suffix=".parquet"):
        base = f.rsplit("/", 1)[-1]
        if base not in referenced:
            store.delete_file(DATA_DIR, base)

    total_rows = sum(
        r.metrics.get("rows", 0)
        for r in manifest.load_partitions().values()
        if r.stage == STAGE
    )
    out = manifest.finalize(
        config={
            "kind": "export",
            "rows_per_shard": rows_per_shard,
            "columns": columns,
        },
        stats={"rows": total_rows, "shards": len(fingerprints)},
    )
    out["shards_this_run"] = shards_this_run
    return out


def read_exported(
    out_uri: str | Path | Store, *, out_filesystem=None
) -> ray.data.Dataset:
    """Dataset over the committed shards of a finished export."""
    from .index.manifest import load_manifest

    store = Store.resolve(out_uri, out_filesystem)
    manifest = load_manifest(store)
    files = sorted(
        f
        for p in manifest.get("partitions", [])
        if p.get("stage") == STAGE
        for f in p.get("output_files", [])
    )
    return ray.data.read_parquet(files, filesystem=store.fs)
