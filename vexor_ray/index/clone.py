"""Resumable index replication between stores (backup / migration / DR).

``clone_index(src, dst)`` physically copies a committed index — segments,
docs checkpoint, term dictionaries, deletion ledger/tombstones, partition
records — from one ``pyarrow.fs`` store to another and commits a manifest
whose absolute paths are rewritten to the destination.  The operational
gap this closes on object stores: the reference's index is one SQLite file
you can ``cp`` (``vexor/cache.py``); a distributed index is thousands of
immutable objects plus a pointer, and a faithful copy must (a) be
restartable mid-transfer and (b) become visible atomically.

Protocol (same discipline as the build):

- data objects copy first, streamed in bounded chunks, each skipped when
  the destination already holds the same byte size (resume = re-run);
- partition records copy next with their ``output_files`` rewritten, so
  incremental builds / compaction / purge keep working on the clone;
- the manifest commits LAST via the standard ``manifest-<nonce>`` +
  ``CURRENT`` pointer swap — a reader of the destination sees either
  nothing or a complete index, never a partial copy.

Works for any directory built by this repo's manifest protocol (the BM25
index and the positional sidecar share it).  ``input_files`` are left
untouched: they reference the source CORPUS, which the clone still reads
for staleness checks and incremental updates.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

from .manifest import BuildManifest, load_manifest
from .storage import Store

_COPY_CHUNK = 8 << 20  # 8 MiB per read: bounded memory on any object size


def _rewrite_paths(obj: Any, src_base: str, dst_base: str) -> Any:
    """Recursively rewrite every string path under ``src_base``."""
    if isinstance(obj, str):
        if obj.startswith(src_base + "/") or obj == src_base:
            return dst_base + obj[len(src_base):]
        return obj
    if isinstance(obj, list):
        return [_rewrite_paths(v, src_base, dst_base) for v in obj]
    if isinstance(obj, dict):
        return {k: _rewrite_paths(v, src_base, dst_base) for k, v in obj.items()}
    return obj


def _collect_files(man: dict, records: dict, src: Store) -> set[str]:
    """Every data object the committed index references (absolute paths)."""
    files: set[str] = set()

    def walk(obj: Any) -> None:
        if isinstance(obj, str):
            if obj.startswith(src.base + "/"):
                files.add(obj)
        elif isinstance(obj, list):
            for v in obj:
                walk(v)
        elif isinstance(obj, dict):
            for v in obj.values():
                walk(v)

    walk(man)
    for rec in records.values():
        walk(rec.output_files)
        walk(rec.lineage)
    deletes = man.get("deletes") or {}
    for key in ("ledger", "tomb"):
        name = deletes.get(key)
        if name:
            files.add(src.path("_deletes", name))
    return files


def _copy_file(src: Store, dst: Store, src_path: str, dst_path: str) -> bool:
    """Chunked copy; skipped (returns False) when dst already matches size."""
    import pyarrow.fs as pafs

    want = src.fs.get_file_info(src_path).size
    info = dst.fs.get_file_info(dst_path)
    if info.type == pafs.FileType.File and info.size == want:
        return False
    parent = dst_path.rsplit("/", 1)[0]
    dst.fs.create_dir(parent, recursive=True)
    with src.fs.open_input_stream(src_path) as fin:
        with dst.fs.open_output_stream(dst_path) as fout:
            while True:
                buf = fin.read(_COPY_CHUNK)
                if not buf:
                    break
                fout.write(buf)
    return True


def clone_index(
    source_index,
    dest_index,
    *,
    source_filesystem=None,
    dest_filesystem=None,
) -> dict:
    """Replicate a committed index directory to another store.

    Returns ``{"files_total", "files_copied", "bytes_copied", "manifest"}``.
    Idempotent and resumable: a killed clone re-run skips every object the
    destination already holds (size check); the destination manifest
    commits only after every object landed.
    """
    src = Store.resolve(source_index, source_filesystem)
    dst = Store.resolve(dest_index, dest_filesystem)
    if src.fs is dst.fs and src.base == dst.base:
        raise ValueError("clone source and destination are the same store")
    man = load_manifest(src)
    records = BuildManifest(src).load_partitions()

    files = set(_collect_files(man, records, src))
    # retained snapshot history rides along: each NON-current snapshot
    # object is replicated under its ORIGINAL name (so pinned
    # manifest_name readers work on the clone) together with any extra
    # data files only it references — serving-tier rollback on the
    # replica (README "Deploying the query tier")
    from .manifest import list_manifests

    import pyarrow.fs as _pafs

    history: list[tuple[str, dict]] = []
    for e in list_manifests(src):
        if e["current"]:
            continue
        try:
            old_man = src.read_json(e["name"])
        except (FileNotFoundError, OSError, ValueError):
            continue  # torn/expired snapshot object protects nothing
        extra = _collect_files(old_man, {}, src)
        # a pre-compaction/purge snapshot may reference rewritten data
        # files that no longer exist — it is already unpinnable on the
        # SOURCE, so skip it instead of crashing the whole clone
        missing = [
            f
            for f in extra - files
            if src.fs.get_file_info(f).type != _pafs.FileType.File
        ]
        if missing:
            continue
        history.append((e["name"], old_man))
        files |= extra

    files = sorted(files)
    copied = 0
    nbytes = 0
    dst.mkdirs()
    for f in files:
        rel = f[len(src.base) + 1 :]
        if _copy_file(src, dst, f, dst.path(rel)):
            copied += 1
            nbytes += src.fs.get_file_info(f).size

    for name, old_man in history:
        dst_store_man = _rewrite_paths(old_man, src.base, dst.base)
        dst.write_json_atomic(name, dst_store_man)

    # partition records with rewritten output paths — committed before the
    # manifest so a visible clone is always a complete, maintainable one
    dst_manifest = BuildManifest(dst)
    for rec in records.values():
        import dataclasses

        clone_rec = dataclasses.replace(
            rec,
            output_files=_rewrite_paths(rec.output_files, src.base, dst.base),
            lineage=_rewrite_paths(rec.lineage, src.base, dst.base),
        )
        # direct record write (not commit_partition: keep committed_at and
        # skip the fault-injection counter — a clone is not a build)
        dst_manifest.partial.write_json_atomic(
            f"{clone_rec.key()}.json", dataclasses.asdict(clone_rec)
        )

    new_man = _rewrite_paths(
        {k: v for k, v in man.items() if k not in ("format_version",)},
        src.base,
        dst.base,
    )
    result = dst_manifest.finalize(
        config=new_man["config"],
        stats=new_man["stats"],
        extra={
            k: v
            for k, v in new_man.items()
            if k not in ("config", "stats", "partitions")
        },
    )
    return {
        "files_total": len(files),
        "files_copied": copied,
        "bytes_copied": nbytes,
        "manifest": result,
    }
