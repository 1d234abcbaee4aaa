"""Streaming ingestion: micro-batch arrivals → delta index generations.

The reference is batch-only (``vexor index`` re-walks the corpus,
``services/index_service.py:565-643`` re-indexes changed files); this module
is the arrival-driven analogue a continuously-crawled corpus needs, built
entirely on machinery that already exists:

- every micro-batch becomes one pages parquet shard named to sort AFTER all
  committed shards (``batch-{seq:012d}.parquet`` — the pad is wide enough
  that lexical order never regresses at any reachable sequence number), so
  lineage docIDs of already-indexed pages never move
  (``stages/docids.doc_id_base`` is file-position-based);
- :func:`vexor_ray.index.build.build_index` then appends delta GENERATIONS
  covering only the new/extended shard groups (row-level incrementality,
  S7) — queries on a refreshed ``Searcher`` see exactly the committed
  watermark, never a half-ingested batch;
- the stream state (committed sequence numbers + event-time watermark) is a
  JSON manifest committed by atomic rename AFTER the index build succeeds.

Crash-safety contract (test: ``tests/test_streaming.py``):

- killed before the pages shard renames in → nothing changed;
- killed after the shard landed but before the index build / state commit →
  the shard is an ORPHAN: queries still serve the old watermark (the index
  manifest is itself committed atomically), and the next ``ingest_batch`` /
  ``recover()`` adopts the orphan into the build, so every accepted row is
  indexed at-least-once and becomes visible atomically with a state commit;
- killed mid-build → the build checkpoint manifest resumes finished
  partitions (``tests/test_resume.py`` discipline), same adoption path.

Late data: each batch may carry an event-time column (``warc_ts``).  The
WATERMARK is the max committed event time minus ``allowed_lateness_s``.
``late_policy="accept"`` indexes late rows anyway (correct corpus, coarser
ordering guarantee); ``late_policy="drop"`` drops rows older than the
watermark and reports them — the two policies real stream processors offer.

Scale notes: state is O(#batches) driver-side JSON; the heavy path is the
normal distributed build over only the dirty shard groups.  At 100 TB the
per-batch cost is tokenizing the new shard group + one per-wave sort over
its postings — independent of corpus size.
"""

from __future__ import annotations

import time
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .index.build import BuildConfig, build_index
from .index.storage import Store

_STATE_NAME = "stream_state.json"


class StreamingIngestor:
    """Micro-batch pages → incrementally maintained index under ``root``.

    Layout::

        root/pages/batch-000000000000.parquet   committed + orphan shards
        root/index/...                    the live index (atomic manifest)
        root/stream_state.json            committed seqs + watermark
    """

    def __init__(
        self,
        root: str | Path | Store,
        cfg: BuildConfig | None = None,
        *,
        event_time_col: str = "warc_ts",
        late_policy: str = "accept",
        allowed_lateness_s: float = 0.0,
        filesystem=None,
    ):
        if late_policy not in ("accept", "drop"):
            raise ValueError(f"unknown late_policy {late_policy!r}")
        self.store = Store.resolve(root, filesystem)
        self.pages = self.store.sub("pages")
        self.index = self.store.sub("index")
        self.pages.mkdirs()
        self.cfg = cfg or BuildConfig(
            pre_extracted=True, doc_builder="text", num_waves=1
        )
        self.event_time_col = event_time_col
        self.late_policy = late_policy
        self.allowed_lateness_us = int(allowed_lateness_s * 1_000_000)

    # historical attribute names (accepted anywhere a path is):
    @property
    def pages_dir(self) -> "Store | Path":
        return Path(self.pages.base) if self.pages.atomic_rename else self.pages

    @property
    def index_dir(self) -> "Store | Path":
        return Path(self.index.base) if self.index.atomic_rename else self.index

    # -- state ------------------------------------------------------------
    def load_state(self) -> dict:
        if not self.store.exists(_STATE_NAME):
            return {"next_seq": 0, "committed": [], "watermark_us": None}
        return self.store.read_json(_STATE_NAME)

    def _commit_state(self, state: dict) -> None:
        # temp+rename on local; whole-object PUT elsewhere (atomic either
        # way at this object size — see storage.Store.write_json_atomic)
        self.store.write_json_atomic(_STATE_NAME, state)

    @property
    def watermark_us(self) -> int | None:
        """Event-time watermark of the COMMITTED stream (µs), or None."""
        return self.load_state()["watermark_us"]

    # -- ingestion --------------------------------------------------------
    def _orphans(self, state: dict) -> list[str]:
        committed = {c["file"] for c in state["committed"]}
        return sorted(
            f
            for f in self.pages.list_files(suffix=".parquet")
            if f.rsplit("/", 1)[-1].startswith("batch-")
            and f.rsplit("/", 1)[-1] not in committed
        )

    def _max_event_us(self, path: str) -> int | None:
        if self.event_time_col is None:
            return None
        try:
            tbl = pq.read_table(
                path, columns=[self.event_time_col], filesystem=self.store.fs
            )
        except Exception:
            return None
        col = tbl.column(self.event_time_col)
        if col.null_count == len(col) or len(col) == 0:
            return None
        return pc.max(col).cast(pa.int64()).as_py()

    def ingest_batch(self, batch: pa.Table) -> dict:
        """Land one micro-batch, rebuild deltas, commit the new watermark.

        Returns ``{"seq", "rows_in", "rows_late_dropped", "watermark_us",
        "build_wall_s"}``.  Adopts any orphan shards from a previous crash
        into the same build, so the commit is exactly the on-disk corpus.
        """
        state = self.load_state()
        n_in = batch.num_rows
        n_dropped = 0
        if (
            self.late_policy == "drop"
            and state["watermark_us"] is not None
            and self.event_time_col in batch.column_names
        ):
            cutoff = state["watermark_us"] - self.allowed_lateness_us
            ts = batch.column(self.event_time_col).cast(pa.int64())
            keep = pc.fill_null(pc.greater_equal(ts, cutoff), False)
            n_dropped = n_in - pc.sum(pc.cast(keep, pa.int64())).as_py()
            if n_dropped:
                batch = batch.filter(keep)

        seq = state["next_seq"]
        written: str | None = None
        if batch.num_rows > 0:
            # one shard per batch, atomically committed (rename on local,
            # whole-object PUT on object stores); the name sorts after
            # every committed shard so existing docIDs are stable
            written = self.pages.write_table_atomic(
                batch, f"batch-{seq:012d}.parquet"
            )

        return self._build_and_commit(state, seq_used=seq if written else None,
                                      rows_in=n_in, rows_dropped=n_dropped)

    def recover(self) -> dict | None:
        """Adopt orphan shards left by a crash; None when there is nothing."""
        state = self.load_state()
        if not self._orphans(state):
            return None
        return self._build_and_commit(state, seq_used=None, rows_in=0,
                                      rows_dropped=0)

    def _build_and_commit(
        self, state: dict, *, seq_used: int | None, rows_in: int,
        rows_dropped: int,
    ) -> dict:
        orphans = self._orphans(state)  # includes the shard just written
        t0 = time.perf_counter()
        if orphans:
            build_index(self.pages, self.index, self.cfg)
        wall = round(time.perf_counter() - t0, 3)

        watermark = state["watermark_us"]
        for f in orphans:
            ts = self._max_event_us(f)
            if ts is not None:
                watermark = ts if watermark is None else max(watermark, ts)
            name = f.rsplit("/", 1)[-1]
            meta = pq.ParquetFile(self.store.fs.open_input_file(f)).metadata
            state["committed"].append(
                {
                    "seq": int(name.removesuffix(".parquet").split("-")[1]),
                    "file": name,
                    "rows": meta.num_rows,
                }
            )
        state["watermark_us"] = watermark
        state["next_seq"] = max(
            state["next_seq"] + (1 if seq_used is not None else 0),
            1 + max((c["seq"] for c in state["committed"]), default=-1),
        )
        self._commit_state(state)
        return {
            "seq": seq_used,
            "rows_in": rows_in,
            "rows_late_dropped": rows_dropped,
            "watermark_us": watermark,
            "build_wall_s": wall,
            "adopted_orphans": len(orphans) - (1 if seq_used is not None else 0),
        }

    # -- convenience ------------------------------------------------------
    def searcher(self):
        from .query.searcher import Searcher

        return Searcher(self.index)

    def compact(self) -> None:
        """Fold the accumulated delta generations into fresh full ones."""
        from .index.build import compact_index

        compact_index(self.pages, self.index, self.cfg)
