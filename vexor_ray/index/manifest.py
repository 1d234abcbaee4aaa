"""Checkpoint manifests: per-partition lineage + metrics, atomic commit, resume.

Protocol (SURVEY.md §4):

- during a build, every completed partition (stage-1 shard group, the docs
  stage, each stage-3 wave) commits one JSON record under
  ``<index_dir>/_manifest/`` via write-temp-then-atomic-rename;
- a restarted build skips any partition whose committed record matches the
  partition's current input fingerprint (anti-join of work units vs
  manifest — no recomputation);
- ``finalize`` aggregates all records plus global stats into
  ``<index_dir>/manifest.json`` (atomic rename).  Query visibility is gated
  on the final manifest: a killed build is invisible to readers.

Each record carries ``lineage`` (stage, partition id, input fingerprint and
files, build-config hash) and ``metrics`` (rows in/out, tokens, postings,
bytes, wall seconds) — the north rule's per-partition lineage + metrics.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

from ..spec import INDEX_FORMAT_VERSION

MANIFEST_NAME = "manifest.json"
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


def _atomic_write_json(path: Path, payload: dict) -> None:
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_text(json.dumps(payload, indent=1, sort_keys=True))
    os.replace(tmp, path)


class BuildManifest:
    """Partial-manifest store for one index build directory."""

    def __init__(self, index_dir: str | Path, fail_after_partitions: int | None = None):
        self.index_dir = Path(index_dir)
        self.partial_dir = self.index_dir / PARTIAL_DIR
        self.partial_dir.mkdir(parents=True, exist_ok=True)
        self._fail_after = fail_after_partitions
        self._commits_this_run = 0

    # -- resume ------------------------------------------------------------
    def load_partitions(self) -> dict[str, PartitionRecord]:
        records: dict[str, PartitionRecord] = {}
        for p in sorted(self.partial_dir.glob("*.json")):
            try:
                data = json.loads(p.read_text())
                rec = PartitionRecord(**data)
            except (json.JSONDecodeError, TypeError):
                continue  # torn write (non-atomic copy) — treated as absent
            records[rec.key()] = rec
        return records

    def is_done(self, stage: str, partition_id: str, input_fingerprint: str) -> bool:
        rec = self.load_partitions().get(f"{stage}--{partition_id}")
        if rec is None or rec.status != "done":
            return False
        if rec.input_fingerprint != input_fingerprint:
            return False
        return all(Path(f).exists() for f in rec.output_files)

    def delete_partition(self, key: str) -> None:
        """Drop a committed record (full-rebuild invalidation of stale
        generations); atomic at the file level."""
        p = self.partial_dir / f"{key}.json"
        if p.exists():
            p.unlink()

    # -- commit ------------------------------------------------------------
    def commit_partition(self, record: PartitionRecord) -> None:
        record.committed_at = time.time()
        _atomic_write_json(
            self.partial_dir / f"{record.key()}.json", dataclasses.asdict(record)
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
        _atomic_write_json(self.index_dir / MANIFEST_NAME, manifest)
        return manifest


def load_manifest(index_dir: str | Path) -> dict:
    path = Path(index_dir) / MANIFEST_NAME
    if not path.exists():
        raise FileNotFoundError(
            f"no committed index manifest at {path} (build incomplete or not finalized)"
        )
    return json.loads(path.read_text())
