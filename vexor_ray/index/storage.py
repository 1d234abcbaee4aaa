"""Storage abstraction: every index/manifest/stream-state byte goes through
a ``pyarrow.fs.FileSystem``, so the same build/query/streaming code runs on
a local disk, NFS, or an object store (S3/GCS-class) without change.

Why this exists (the multi-node story): on a real cluster, workers and the
driver do NOT share a local filesystem, and object stores have NO atomic
rename — so the classic write-temp-then-``os.replace`` commit protocol is a
local-disk-only trick.  The protocols here assume only two primitives every
store provides:

- **whole-object PUT is atomic** (a reader sees the old object, nothing, or
  the complete new object — S3-class stores and POSIX ``O_CREAT`` writes
  both satisfy this at the granularity we use: small JSON objects);
- **listing and point reads are strongly consistent with PUT** (true of S3
  since 2020, GCS, and any POSIX filesystem).

Commit protocols built on those primitives:

- *Partition records* (``manifest.BuildManifest``): one small JSON object
  per completed partition, PUT once, never rewritten.  Where the substrate
  has real atomic rename (local fs) we still write-temp-then-rename as a
  belt; where it does not we PUT directly — a torn/partial object is
  already tolerated by the reader (undecodable JSON ≡ absent).
- *Data directories* (``segments/``, ``docs_tok/``): each build ATTEMPT
  writes into a fresh ``<partition>--<nonce>/`` directory and the file list
  is recorded in the partition record — visibility comes from the record
  commit, never from directory listing, so no directory rename is needed
  and a crashed attempt's leftovers are invisible (and garbage-collected on
  the next successful commit of the same partition).
- *Final manifest*: write ``manifest-<nonce>.json`` (full PUT), then swap a
  tiny ``CURRENT`` pointer object to its name.  Single-writer per index
  directory (the reference's ``BEGIN IMMEDIATE`` analogue,
  ``vexor/cache.py:515-516``), so last-writer-wins on the pointer is sound.
  On local filesystems a legacy ``manifest.json`` is also committed by
  atomic rename for older readers.

``NoRenameFileSystem`` at the bottom is the test double: a real on-disk
filesystem (shared across Ray workers, unlike any in-memory fs) that
REFUSES move/rename and append — exactly the object-store contract — so CI
proves none of the protocols rely on rename.
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

import pyarrow.fs as pafs


def _posix_join(base: str, *parts: str) -> str:
    out = base.rstrip("/")
    for p in parts:
        p = str(p).strip("/")
        if p:
            out = f"{out}/{p}" if out else p
    return out


class Store:
    """One (filesystem, base-path) pair + the small-file IO protocols."""

    def __init__(self, fs: pafs.FileSystem, base: str):
        self.fs = fs
        self.base = str(base).rstrip("/")
        # real atomic rename exists only on a genuinely local filesystem;
        # everything else (subtree wrappers, object stores, test doubles)
        # gets the PUT-based protocols
        self.atomic_rename = getattr(fs, "type_name", "") == "local"

    # -- construction --------------------------------------------------
    @staticmethod
    def resolve(target, filesystem: pafs.FileSystem | None = None) -> "Store":
        """``Store`` | URI string | local path (+ optional explicit fs)."""
        if isinstance(target, Store):
            if filesystem is not None and filesystem is not target.fs:
                raise ValueError("got a Store AND a filesystem override")
            return target
        if filesystem is not None:
            return Store(filesystem, str(target))
        t = str(target)
        if "://" in t:
            fs, path = pafs.FileSystem.from_uri(t)
            return Store(fs, path)
        return Store(pafs.LocalFileSystem(), str(Path(t).absolute()))

    def sub(self, *parts: str) -> "Store":
        return Store(self.fs, self.path(*parts))

    def path(self, *parts: str) -> str:
        return _posix_join(self.base, *parts)

    # -- info ------------------------------------------------------------
    def _info(self, full_path: str) -> pafs.FileInfo:
        return self.fs.get_file_info(full_path)

    def exists(self, *parts: str) -> bool:
        return self._info(self.path(*parts)).type != pafs.FileType.NotFound

    def exists_abs(self, full_path: str) -> bool:
        return self._info(full_path).type != pafs.FileType.NotFound

    def file_size_abs(self, full_path: str) -> int:
        return int(self._info(full_path).size or 0)

    def mkdirs(self, *parts: str) -> None:
        self.fs.create_dir(self.path(*parts), recursive=True)

    def listdir(self, *parts: str) -> list[pafs.FileInfo]:
        sel = pafs.FileSelector(
            self.path(*parts), recursive=False, allow_not_found=True
        )
        return self.fs.get_file_info(sel)

    def list_files(self, *parts: str, suffix: str = "") -> list[str]:
        """Sorted full paths of plain files under a directory."""
        return sorted(
            i.path
            for i in self.listdir(*parts)
            if i.type == pafs.FileType.File and i.path.endswith(suffix)
        )

    def subdirs(self, *parts: str) -> list[str]:
        """Sorted names (not paths) of immediate subdirectories."""
        return sorted(
            i.base_name
            for i in self.listdir(*parts)
            if i.type == pafs.FileType.Directory
        )

    # -- destruction -------------------------------------------------------
    def delete_dir(self, *parts: str) -> None:
        try:
            self.fs.delete_dir(self.path(*parts))
        except (FileNotFoundError, OSError):
            pass

    def owns_abs(self, full_path: str) -> bool:
        """True when ``full_path`` lies under this store's base.

        The ownership test every GC of a RECORDED path must pass: partition
        records carry absolute file/dir paths, so a byte-copied index
        directory (``cp -r`` instead of :func:`vexor_ray.index.clone.clone_index`,
        which rewrites recorded paths) carries records pointing into the
        SOURCE index — GC following them verbatim would destroy an index it
        does not own.  Foreign paths are skipped, never deleted.
        """
        base = self.base
        if not base:
            return True
        p = str(full_path)
        return p == base or p.startswith(base + "/")

    def delete_dir_abs(self, full_path: str) -> None:
        if not self.owns_abs(full_path):
            return
        try:
            self.fs.delete_dir(full_path)
        except (FileNotFoundError, OSError):
            pass

    def delete_file_abs(self, full_path: str) -> None:
        if not self.owns_abs(full_path):
            return
        try:
            self.fs.delete_file(full_path)
        except (FileNotFoundError, OSError):
            pass

    def delete_file(self, *parts: str) -> None:
        try:
            self.fs.delete_file(self.path(*parts))
        except (FileNotFoundError, OSError):
            pass

    # -- small-object IO ---------------------------------------------------
    def read_bytes_abs(self, full_path: str) -> bytes:
        with self.fs.open_input_stream(full_path) as f:
            return f.read()

    def read_json(self, *parts: str) -> dict:
        return json.loads(self.read_bytes_abs(self.path(*parts)))

    def write_json_atomic(self, relpath: str, payload: dict) -> None:
        """Commit one small JSON object.

        Local fs: write-temp-then-rename (true atomicity, crash leaves no
        torn object).  Non-local: one whole-object PUT — readers of these
        objects tolerate absence and undecodable partials by design, and
        object-store PUTs are whole-object-atomic anyway.
        """
        data = json.dumps(payload, indent=1, sort_keys=True).encode()
        full = self.path(relpath)
        if self.atomic_rename:
            tmp = f"{full}.tmp-{uuid.uuid4().hex[:8]}"
            with self.fs.open_output_stream(tmp) as f:
                f.write(data)
            os.replace(tmp, full)  # local fs: real rename(2)
        else:
            with self.fs.open_output_stream(full) as f:
                f.write(data)

    # -- parquet helpers -----------------------------------------------------
    def open_input_abs(self, full_path: str):
        return self.fs.open_input_file(full_path)

    def write_table(self, table, relpath: str) -> str:
        import pyarrow.parquet as pq

        full = self.path(relpath)
        pq.write_table(table, full, filesystem=self.fs)
        return full

    def write_table_atomic(self, table, relpath: str) -> str:
        """Commit one parquet object: temp+rename on local (a crash never
        leaves a torn file under the final name), single PUT elsewhere
        (object-store PUTs are whole-object atomic by contract)."""
        import pyarrow.parquet as pq

        full = self.path(relpath)
        if self.atomic_rename:
            tmp = f"{full}.tmp-{uuid.uuid4().hex[:8]}"
            pq.write_table(table, tmp, filesystem=self.fs)
            os.replace(tmp, full)
        else:
            pq.write_table(table, full, filesystem=self.fs)
        return full


def attempt_dir(pid: str) -> str:
    """Fresh uniquely-named data directory for one build attempt of ``pid``.

    Visibility comes from the partition-record commit (the record carries
    the file list), so the directory itself never needs a rename: a crashed
    attempt's directory is simply never referenced.
    """
    return f"{pid}--{uuid.uuid4().hex[:8]}"


def attempt_pid(dirname: str) -> str:
    """Inverse of :func:`attempt_dir` (also accepts legacy nonce-less names)."""
    return dirname.split("--", 1)[0]


def gc_stale_attempts(
    store: Store,
    parent: str,
    pid: str,
    keep: set[str],
    protect: "set[str] | frozenset" = frozenset(),
) -> None:
    """Delete other attempts' directories for ``pid`` after a commit.

    ``keep`` holds the directory names referenced by committed records;
    ``protect`` holds FULL directory paths referenced by retained
    snapshots (``manifest.protected_data_dirs``) — those stay on disk
    until their snapshots expire.  Idempotent and crash-safe: deleted
    directories are unreferenced by any record, so a kill mid-delete just
    leaves orphans for the next pass.
    """
    for name in store.subdirs(parent):
        if (
            attempt_pid(name) == pid
            and name not in keep
            and store.path(parent, name) not in protect
        ):
            store.delete_dir(parent, name)


# --------------------------------------------------------------------------
# test double: a shared on-disk filesystem with OBJECT-STORE semantics
# --------------------------------------------------------------------------


class _NoRenameHandler(pafs.FileSystemHandler):
    """Delegates to a local directory but refuses move/rename and append —
    the object-store contract.  Holds only the root string, so it pickles
    cleanly into Ray workers, and all workers see the same (on-disk) state —
    unlike any in-memory filesystem, which would be per-process."""

    def __init__(self, root: str):
        self.root = str(root)
        self._local = pafs.LocalFileSystem()

    def _full(self, path: str) -> str:
        return _posix_join(self.root, path)

    # identity -----------------------------------------------------------
    def get_type_name(self) -> str:
        return "no-rename"

    def __eq__(self, other) -> bool:
        return isinstance(other, _NoRenameHandler) and other.root == self.root

    def __ne__(self, other) -> bool:
        return not self.__eq__(other)

    def normalize_path(self, path: str) -> str:
        return path

    # info -----------------------------------------------------------------
    def _strip(self, info: pafs.FileInfo, path: str) -> pafs.FileInfo:
        return pafs.FileInfo(
            path, type=info.type, size=info.size, mtime=info.mtime
        )

    def get_file_info(self, paths):
        return [
            self._strip(self._local.get_file_info(self._full(p)), p)
            for p in paths
        ]

    def get_file_info_selector(self, selector):
        sel = pafs.FileSelector(
            self._full(selector.base_dir),
            recursive=selector.recursive,
            allow_not_found=selector.allow_not_found,
        )
        prefix = self._full("").rstrip("/") + "/"
        out = []
        for info in self._local.get_file_info(sel):
            rel = info.path[len(prefix):] if info.path.startswith(prefix) else info.path
            out.append(self._strip(info, rel))
        return out

    # directories ------------------------------------------------------------
    def create_dir(self, path, recursive):
        self._local.create_dir(self._full(path), recursive=recursive)

    def delete_dir(self, path):
        self._local.delete_dir(self._full(path))

    def delete_dir_contents(self, path, missing_dir_ok=False):
        self._local.delete_dir_contents(
            self._full(path), missing_dir_ok=missing_dir_ok
        )

    def delete_root_dir_contents(self):
        self._local.delete_dir_contents(self.root, accept_root_dir=True)

    # files ------------------------------------------------------------------
    def delete_file(self, path):
        self._local.delete_file(self._full(path))

    def move(self, src, dest):
        raise NotImplementedError(
            "no-rename filesystem: object stores cannot move/rename"
        )

    def copy_file(self, src, dest):
        self._local.copy_file(self._full(src), self._full(dest))

    def open_input_stream(self, path):
        return self._local.open_input_stream(self._full(path))

    def open_input_file(self, path):
        return self._local.open_input_file(self._full(path))

    def open_output_stream(self, path, metadata):
        return self._local.open_output_stream(self._full(path))

    def open_append_stream(self, path, metadata):
        raise NotImplementedError(
            "no-rename filesystem: object stores cannot append"
        )


def no_rename_filesystem(root: str | Path) -> pafs.PyFileSystem:
    """On-disk filesystem with object-store semantics (no rename/append).

    Use in tests/CI to prove the index protocols never rely on rename:
    ``build_index(pages, "idx", filesystem=no_rename_filesystem(tmp))``.
    """
    return pafs.PyFileSystem(_NoRenameHandler(str(root)))
