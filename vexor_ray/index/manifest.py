"""Checkpoint manifests: per-partition lineage + metrics, atomic commit, resume.

Protocol (SURVEY.md §4, re-hosted on cluster storage via ``storage.Store``):

- during a build, every completed partition (stage-1 shard group, the docs
  stage, each stage-3 wave generation) commits one JSON record under
  ``<index_dir>/_manifest/``.  Records are small whole-object PUTs (plus a
  temp-and-rename belt where the substrate is a real local fs); a torn or
  half-written record is indistinguishable from an absent one to readers;
- a restarted build skips any partition whose committed record matches the
  partition's current input fingerprint AND whose recorded output files all
  still exist (checked through the same filesystem) — anti-join of work
  units vs manifest, no recomputation;
- ``finalize`` aggregates all records plus global stats into a fresh
  ``manifest-<nonce>.json`` and then commits by swapping the tiny
  ``CURRENT`` pointer object to its name — the object-store-safe replacement
  for an ``os.replace`` rename (single writer per index dir, so
  last-writer-wins on the pointer is sound).  On local filesystems a legacy
  ``manifest.json`` is also committed by real atomic rename, for older
  readers.  Query visibility is gated on the committed pointer: a killed
  build is invisible.

Each record carries ``lineage`` (stage, partition id, input fingerprint and
files, build-config hash) and ``metrics`` (rows in/out, tokens, postings,
bytes, wall seconds) — the north rule's per-partition lineage + metrics.
"""

from __future__ import annotations

import dataclasses
import json
import time
import uuid
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

from ..spec import INDEX_FORMAT_VERSION
from .storage import Store

MANIFEST_NAME = "manifest.json"  # legacy local-fs name (still written there)
POINTER_NAME = "CURRENT"
PARTIAL_DIR = "_manifest"


class InjectedFault(RuntimeError):
    """Raised by the fault-injection hook (resume tests)."""


@dataclass
class PartitionRecord:
    stage: str
    partition_id: str
    input_fingerprint: str
    output_files: list[str] = field(default_factory=list)
    metrics: dict[str, Any] = field(default_factory=dict)
    lineage: dict[str, Any] = field(default_factory=dict)
    status: str = "done"
    committed_at: float = 0.0

    def key(self) -> str:
        return f"{self.stage}--{self.partition_id}"


class BuildManifest:
    """Partial-manifest store for one index build directory."""

    def __init__(
        self,
        index_dir: str | Path | Store,
        fail_after_partitions: int | None = None,
        *,
        filesystem=None,
    ):
        self.store = Store.resolve(index_dir, filesystem)
        self.partial = self.store.sub(PARTIAL_DIR)
        self.partial.mkdirs()
        self._fail_after = fail_after_partitions
        self._commits_this_run = 0

    # -- resume ------------------------------------------------------------
    def load_partitions(self) -> dict[str, PartitionRecord]:
        records: dict[str, PartitionRecord] = {}
        for p in self.partial.list_files(suffix=".json"):
            try:
                data = json.loads(self.partial.read_bytes_abs(p))
                rec = PartitionRecord(**data)
            except (json.JSONDecodeError, TypeError, UnicodeDecodeError):
                continue  # torn write (non-atomic PUT) — treated as absent
            records[rec.key()] = rec
        return records

    def is_done(self, stage: str, partition_id: str, input_fingerprint: str) -> bool:
        rec = self.load_partitions().get(f"{stage}--{partition_id}")
        if rec is None or rec.status != "done":
            return False
        if rec.input_fingerprint != input_fingerprint:
            return False
        return all(self.store.exists_abs(f) for f in rec.output_files)

    def delete_partition(self, key: str) -> None:
        """Drop a committed record (full-rebuild invalidation of stale
        generations); atomic at the object level."""
        self.partial.delete_file(f"{key}.json")

    # -- commit ------------------------------------------------------------
    def commit_partition(self, record: PartitionRecord) -> None:
        record.committed_at = time.time()
        self.partial.write_json_atomic(
            f"{record.key()}.json", dataclasses.asdict(record)
        )
        self._commits_this_run += 1
        if self._fail_after is not None and self._commits_this_run >= self._fail_after:
            raise InjectedFault(
                f"fault injection: killed after {self._commits_this_run} partition commits"
            )

    # -- finalize ----------------------------------------------------------
    def finalize(self, config: dict, stats: dict, extra: dict | None = None) -> dict:
        partitions = [dataclasses.asdict(r) for r in self.load_partitions().values()]
        partitions.sort(key=lambda r: (r["stage"], r["partition_id"]))
        manifest = {
            "format_version": INDEX_FORMAT_VERSION,
            "config": config,
            "stats": stats,
            "partitions": partitions,
            **(extra or {}),
        }
        # pointer-swap commit: full manifest object first, tiny pointer last
        name = f"manifest-{uuid.uuid4().hex[:8]}.json"
        self.store.write_json_atomic(name, manifest)
        self.store.write_json_atomic(POINTER_NAME, {"manifest": name})
        if self.store.atomic_rename:
            # legacy local-fs name, committed by real rename — older readers
            # (and anything probing for manifest.json) keep working
            self.store.write_json_atomic(MANIFEST_NAME, manifest)
        # GC superseded manifest objects (never the one just committed)
        for f in self.store.list_files(suffix=".json"):
            base = f.rsplit("/", 1)[-1]
            if base.startswith("manifest-") and base != name:
                self.store.delete_file(base)
        return manifest


def load_manifest(index_dir: str | Path | Store, *, filesystem=None) -> dict:
    """Read the committed manifest through the pointer (legacy fallback)."""
    store = Store.resolve(index_dir, filesystem)
    if store.exists(POINTER_NAME):
        try:
            name = store.read_json(POINTER_NAME)["manifest"]
            return store.read_json(name)
        except (json.JSONDecodeError, KeyError, FileNotFoundError, OSError):
            pass  # torn pointer PUT or racing GC — try the legacy name
    if store.exists(MANIFEST_NAME):
        return store.read_json(MANIFEST_NAME)
    raise FileNotFoundError(
        f"no committed index manifest under {store.path()} "
        "(build incomplete or not finalized)"
    )


def manifest_exists(index_dir: str | Path | Store, *, filesystem=None) -> bool:
    store = Store.resolve(index_dir, filesystem)
    return store.exists(POINTER_NAME) or store.exists(MANIFEST_NAME)
