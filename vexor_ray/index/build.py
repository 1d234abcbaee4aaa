"""Ray-Data-native inverted-index build (SPIMI-style, checkpointed).

Pipeline (SURVEY.md §3 "our lifecycle"):

``row-group fragment plan (docIDs from lineage: file_idx << 32 | row) →
map_batches(read + extract) → map_batches(TokenizeDocs actor pool) →
[checkpoint: docs_tok per shard group — this IS the docs table] → global
stats → per term-hash wave: explode postings → (term, salt) shuffle →
vectorized run encoder → [checkpoint: segments/wave-N] → finalize manifest``.

Scale design:

- docID assignment is shuffle-free (``stages/docids.py``): the only
  all-to-all in the whole build is the posting exchange, keyed by
  ``(term, salt)`` where ``salt = doc_id >> salt_shift`` bounds any single
  key group to one doc-range regardless of Zipfian term skew (hot-term
  salting);
- stage 2's shuffle is split into ``num_waves`` independent term-hash waves,
  each committed separately → a killed build resumes at wave granularity and
  the peak shuffle footprint is 1/W of the postings;
- every stage writes into a fresh attempt directory and commits a partition
  record (lineage + metrics) whose file list IS the visibility boundary —
  no directory rename, so the same protocol runs on object stores
  (``manifest.py`` / ``storage.py``; all IO goes through ``pyarrow.fs``);
- tokenization runs exactly once per doc; corpus stats (doc_count,
  avg_doc_len) are exact global aggregates read from the docs checkpoint's
  columnar metadata, not a second pass over text.
"""

from __future__ import annotations

import dataclasses
import hashlib
import time
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..hashing import TERM_HASHER_ID, file_fingerprint, hash_terms
from ..spec import (
    BM25_B,
    BM25_K1,
    DEFAULT_NUM_WAVES,
    DEFAULT_SALT_SHIFT,
    FULL_CHAR_LIMIT,
    POSTING_BLOCK_SIZE,
    TOKEN_PATTERN,
)
from ..stages.docids import read_with_doc_ids
from ..stages.extract import make_extract_fn
from ..stages.tokenize import TokenizeDocs
from . import codec
from .manifest import BuildManifest, PartitionRecord
from .storage import Store, attempt_dir, attempt_pid, gc_stale_attempts


@dataclass
class BuildConfig:
    k1: float = BM25_K1
    b: float = BM25_B
    char_limit: int = FULL_CHAR_LIMIT
    pre_extracted: bool = False  # input already has a text column (no html)
    text_only: bool = False  # lexical doc = text alone (no url prefix)
    doc_builder: str = "url_text"  # url_text | text | head (stages/tokenize.py)
    token_pattern: str = TOKEN_PATTERN
    tokenizer: str = "regex"  # regex | bert_union | bpe (stages/berttok.py)
    # learned BPE merge list for tokenizer="bpe" (functions/bpe.py::bpe_train);
    # JSON-safe, recorded in the manifest so query tokenization matches
    bpe_merges: list | None = None
    # analyzer-chain stopword list (JSON-safe): dropped at tokenize time
    # AND at query time (the manifest carries it, so query tokenization
    # always matches the build) — doc lengths/stats see the filtered stream
    stop_words: list | None = None
    embed_dim: int = 0  # > 0 → store a dense hash-embedding column per doc
    # word_mix (unigrams ∪ bigrams) is the measured-best featurizer: eval
    # MRR@10 0.93 vs 0.29 for pure word bigrams at the same dim budget
    # (BASELINE.md sweep); pair with embed_dim >= 2048 for retrieval use
    embed_mode: str = "word_mix"
    # network embedding provider spec (providers.make_provider) — when set,
    # the dense column comes from the provider instead of the hash
    # featurizer; one provider per tokenizer ACTOR (the reference's
    # per-backend persistent client+thread-pool, vexor/providers/openai.py).
    # JSON-safe and secret-free (api keys named by env var, never stored).
    embed_provider: dict | None = None
    block_size: int = POSTING_BLOCK_SIZE
    # posting-stream codec: "varint" (LEB128, fastest encode) or "pfor"
    # (patched frame-of-reference bit-packing, codec.pfor_encode_blocks —
    # 25-75% smaller posting streams at ~1.5x encode cost; decode within
    # ~2x of varint).  Recorded in the manifest; the query layer dispatches
    # per chunk, so federation across mixed-codec indexes just works.
    posting_codec: str = "varint"
    salt_shift: int = DEFAULT_SALT_SHIFT
    num_waves: int = DEFAULT_NUM_WAVES
    # Bucket docs_tok term lists into per-wave columns at tokenize time so
    # each wave's read prunes to 1/W of the term data.  Measured A/B at 400k
    # pages, W=2: flat + explode-time wave filter wins (the extra list
    # columns cost more in checkpoint write + read than the 2x term-column
    # re-read saves), so this defaults OFF; it exists for high-W builds
    # where W-fold read amplification dominates.
    wave_bucketed_tok: bool = False
    # emit_positions → the docs_tok checkpoint carries a ``poss`` column
    # (1-based positions per distinct term), so the positions sidecar can
    # be built from this ONE tokenize pass
    # (positions.build_positions_from_index) instead of re-extracting and
    # re-tokenizing the corpus.  Incompatible with wave_bucketed_tok.
    emit_positions: bool = False
    partitions_per_wave: int = 8
    # "sort": range-partitioned sort by (term, salt) — robust, skew splits
    #   into multiple chunks per key which the query layer merges;
    # "hash": hash-partition repartition(keys=...) with capped aggregator
    #   actors — the classic term-partitioned exchange.
    shuffle_backend: str = "sort"
    shard_group_size: int = 8
    extract_batch_size: int = 256
    tokenize_batch_size: int = 1024
    tokenize_concurrency: int = 4
    # max concurrent encode tasks per node: the encoder saturates memory
    # bandwidth around 8 tasks; beyond that extra tasks only contend
    # (see _encode_task_cpus).  0 disables the cap (1 CPU per task).
    encode_max_concurrent: int = 8
    # Store the impact-ordered companion layout next to each posting chunk
    # (codec.encode_impact) enabling the Threshold-Algorithm scorer
    # (query/impact.py) — exact early termination for cold selective
    # queries.  Opt-in: it roughly doubles segment bytes, the wrong default
    # at 100 TB unless the serving workload needs the cold-selective tail.
    impact_postings: bool = False
    # snapshot retention: finalize() keeps this many committed manifest
    # objects so readers can pin previous snapshots (time-travel across
    # incremental generations — index/manifest.py::list_manifests).
    # Retention policy, not index content: excluded from the rebuild
    # fingerprint.
    manifest_history: int = 3
    fail_after_partitions: int | None = None  # fault injection for resume tests

    def public_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d.pop("fail_after_partitions")
        d["term_hasher"] = TERM_HASHER_ID
        return d


# --------------------------------------------------------------------------
# stage 3 batch functions (module-level so Ray can serialize them cheaply)
# --------------------------------------------------------------------------


def explode_postings(
    batch: pa.Table,
    *,
    salt_shift: int,
    num_waves: int,
    wave: int | None,
    terms_col: str = "terms",
    tfs_col: str = "tfs",
) -> pa.Table:
    """(doc_id, doc_len, terms, tfs) → flat (term, salt, doc_id, tf, dl) rows.

    Arrow list-flatten (zero per-row Python).  ``wave`` filters by term-hash
    wave for FLAT inputs; wave-bucketed docs_tok checkpoints (``terms_w{k}``
    columns, see ``TokenizeDocs``) pass ``wave=None`` with the bucket's
    column names — membership was decided at tokenize time and the per-wave
    read pruned to 1/W of the term data via parquet column selection.
    """
    batch = batch.combine_chunks()
    if batch.num_rows == 0:
        return pa.table(
            {
                "th": pa.array([], type=pa.uint64()),
                "term": pa.array([], type=pa.string()),
                "salt": pa.array([], type=pa.uint64()),
                "doc_id": pa.array([], type=pa.uint64()),
                "tf": pa.array([], type=pa.uint32()),
                "dl": pa.array([], type=pa.uint32()),
            }
        )
    terms_list = batch.column(terms_col)
    flat_terms = pc.list_flatten(terms_list)
    parent = pc.list_parent_indices(terms_list)
    doc_ids = pc.take(batch.column("doc_id"), parent)
    dls = pc.take(batch.column("doc_len"), parent)
    tfs = pc.list_flatten(batch.column(tfs_col))

    # th = deterministic uint64 term hash: the shuffle/sort key (uint64
    # compares are ~an order of magnitude cheaper than term strings) and the
    # query layer's row-group pruning key; also routes waves (th % W).
    # ALL per-term math happens in dictionary space (Zipfian streams have
    # ~1% uniques): hash + wave-membership once per distinct term, then two
    # cheap gathers — measured ~30× less hashing work than per-posting.
    if isinstance(flat_terms, pa.ChunkedArray):
        flat_terms = flat_terms.combine_chunks()
    de = pc.dictionary_encode(flat_terms)
    uniq = np.asarray(de.dictionary.to_numpy(zero_copy_only=False), dtype=object)
    hu = hash_terms(uniq)
    idx = de.indices.to_numpy()
    # int64 view for the gather: numpy fancy-indexing a uint64 table takes a
    # pathologically slow path on this platform (measured ~45×)
    th = hu.view(np.int64)[idx].view(np.uint64)
    out = pa.table(
        {
            "th": pa.array(th, type=pa.uint64()),
            "term": flat_terms,
            "salt": pc.shift_right(
                pc.cast(doc_ids, pa.uint64()), pa.scalar(salt_shift, pa.uint64())
            ),
            "doc_id": pc.cast(doc_ids, pa.uint64()),
            "tf": pc.cast(tfs, pa.uint32()),
            "dl": pc.cast(dls, pa.uint32()),
        }
    )
    if wave is not None and num_waves > 1:
        keep_uniq = (hu % np.uint64(num_waves)) == np.uint64(wave)
        out = out.filter(pa.array(keep_uniq[idx]))
    return out


_CHUNK_SCHEMA = pa.schema(
    [
        ("th", pa.uint64()),
        ("term", pa.string()),
        ("salt", pa.uint64()),
        ("n_postings", pa.uint64()),
        ("doc_blob", pa.large_binary()),
        ("tf_blob", pa.large_binary()),
        ("dl_blob", pa.large_binary()),
        ("doc_off", pa.list_(pa.uint32())),
        ("tf_off", pa.list_(pa.uint32())),
        ("dl_off", pa.list_(pa.uint32())),
        ("block_last", pa.list_(pa.uint64())),
        ("block_ub", pa.list_(pa.float32())),
    ]
)

# companion impact-ordered layout (BuildConfig.impact_postings): absolute
# docIDs/tfs/dls varint-coded in descending idf-free-component order plus the
# per-block frontier maxima the TA scorer prunes with (codec.encode_impact)
_CHUNK_SCHEMA_IMPACT = pa.schema(
    list(_CHUNK_SCHEMA)
    + [
        pa.field("imp_doc_blob", pa.large_binary()),
        pa.field("imp_tf_blob", pa.large_binary()),
        pa.field("imp_dl_blob", pa.large_binary()),
        pa.field("imp_doc_off", pa.list_(pa.uint32())),
        pa.field("imp_tf_off", pa.list_(pa.uint32())),
        pa.field("imp_dl_off", pa.list_(pa.uint32())),
        pa.field("imp_cmax", pa.list_(pa.float32())),
    ]
)


def _offsets_list_array(
    values: np.ndarray, list_offsets: np.ndarray, value_type: pa.DataType
) -> pa.ListArray:
    return pa.ListArray.from_arrays(
        pa.array(list_offsets, type=pa.int32()), pa.array(values, type=value_type)
    )


def _run_relative_offsets(
    byte_off: np.ndarray,
    run_starts: np.ndarray,
    block_starts: np.ndarray,
    block_run: np.ndarray,
    blocks_per_run: np.ndarray,
    n: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-run ``n_blocks+1`` byte-offset lists (relative to the run start)."""
    n_runs = run_starts.size
    run_bounds = np.concatenate([run_starts, [n]])
    run_byte_start = byte_off[run_starts]
    list_off = np.zeros(n_runs + 1, dtype=np.int64)
    np.cumsum(blocks_per_run + 1, out=list_off[1:])
    blk_within = np.arange(block_starts.size) - np.repeat(
        np.concatenate([[0], np.cumsum(blocks_per_run)[:-1]]), blocks_per_run
    )
    values = np.zeros(int(list_off[-1]), dtype=np.uint32)
    values[list_off[block_run] + blk_within] = (
        byte_off[block_starts] - run_byte_start[block_run]
    ).astype(np.uint32)
    values[list_off[1:] - 1] = (byte_off[run_bounds[1:]] - run_byte_start).astype(
        np.uint32
    )
    return values, list_off


def encode_runs(
    batch: pa.Table,
    *,
    avg_doc_len: float,
    block_size: int,
    k1: float,
    b: float,
    impact: bool = False,
    posting_codec: str = codec.CODEC_VARINT,
) -> pa.Table:
    """Encode complete (term, salt) runs of a hash-partitioned, key-sorted block.

    Fully vectorized: one lexsort orders postings by (run, docID), ONE varint
    pass encodes each of the three streams for the whole block, and the
    per-run blobs / per-block skip + block-max metadata are assembled from
    byte-size prefix sums into Arrow arrays without a per-run Python loop.
    Output format is identical to ``codec.encode_chunk`` (tested against it).
    ``impact=True`` additionally emits the impact-ordered companion streams
    (same vectorized discipline: one extra lexsort + one varint pass each).
    """
    batch = batch.combine_chunks()
    n = batch.num_rows
    if n == 0:
        return (_CHUNK_SCHEMA_IMPACT if impact else _CHUNK_SCHEMA).empty_table()
    # the term column stays an ARROW array end to end: materializing ~1M
    # Python str objects per call was the encoder's steady-state fault
    # source (pymalloc returns emptied 256 KB arenas to the OS via munmap,
    # so every call re-faulted ~50 MB of arena pages — measured 12.8k minor
    # faults/call, removed by the Arrow-native compare/take below)
    term_col = batch.column("term")
    term_arr = term_col.chunk(0) if isinstance(term_col, pa.ChunkedArray) else term_col
    ths = batch.column("th").to_numpy()
    salts = batch.column("salt").to_numpy()
    doc_ids = batch.column("doc_id").to_numpy()
    tfs = batch.column("tf").to_numpy()
    dls = batch.column("dl").to_numpy()

    # run boundaries (input sorted by (th, salt); the term equality test
    # additionally splits hash collisions — colliding terms may interleave,
    # fragmenting into extra chunks, which the query layer merges)
    change = (
        (ths[1:] != ths[:-1])
        | (salts[1:] != salts[:-1])
        | pc.not_equal(
            term_arr.slice(1), term_arr.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)
    )
    run_starts = np.concatenate([[0], np.flatnonzero(change) + 1]).astype(np.int64)
    n_runs = run_starts.size
    run_lengths = np.diff(np.concatenate([run_starts, [n]]))
    run_ids = np.repeat(np.arange(n_runs), run_lengths)

    # docID-ascending within each run (docIDs are unique per run)
    order = np.lexsort((doc_ids, run_ids))
    doc_s = doc_ids[order].astype(np.uint64)
    tf_s = tfs[order].astype(np.uint64)
    dl_s = dls[order].astype(np.uint64)

    deltas = doc_s.copy()
    deltas[1:] -= doc_s[:-1]
    deltas[run_starts] = doc_s[run_starts]

    # block structure: fixed-size blocks within each run
    local_idx = np.arange(n) - np.repeat(run_starts, run_lengths)
    block_starts = np.flatnonzero(local_idx % block_size == 0).astype(np.int64)
    blocks_per_run = (run_lengths + block_size - 1) // block_size
    block_run = np.repeat(np.arange(n_runs), blocks_per_run)
    run_bounds = np.concatenate([run_starts, [n]])
    block_ends = np.minimum(block_starts + block_size, run_bounds[block_run + 1])
    block_last = doc_s[block_ends - 1]

    tf_f = tf_s.astype(np.float64)
    dl_f = dl_s.astype(np.float64)
    comp = tf_f * (k1 + 1.0) / (tf_f + k1 * (1.0 - b + b * dl_f / avg_doc_len))
    block_ub = codec.ub_float32(np.maximum.reduceat(comp, block_starts))

    # one codec pass per stream; per-run/per-block layout from size prefix
    # sums.  For pfor the sizes are per BLOCK, expanded to a per-value
    # byte_off that is exact at every block/run boundary — the only indices
    # _run_relative_offsets reads.
    out_cols: dict[str, pa.Array] = {}
    blob_names = {"doc_blob": deltas, "tf_blob": tf_s, "dl_blob": dl_s}
    off_names = {"doc_blob": "doc_off", "tf_blob": "tf_off", "dl_blob": "dl_off"}
    block_m = block_ends - block_starts
    for blob_name, stream in blob_names.items():
        if posting_codec == codec.CODEC_PFOR:
            buf, blk_sizes = codec.pfor_encode_blocks(
                stream, block_starts, block_ends
            )
            blk_off = np.zeros(block_starts.size + 1, dtype=np.int64)
            np.cumsum(blk_sizes, out=blk_off[1:])
            byte_off = np.zeros(n + 1, dtype=np.int64)
            byte_off[:n] = np.repeat(blk_off[:-1], block_m)
            byte_off[n] = blk_off[-1]
        else:
            buf, sizes = codec.varint_encode_with_sizes(stream)
            byte_off = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(sizes, out=byte_off[1:])
        run_byte_bounds = byte_off[run_bounds]
        out_cols[blob_name] = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(),
            n_runs,
            [None, pa.py_buffer(run_byte_bounds.tobytes()), pa.py_buffer(buf)],
        )
        values, list_off = _run_relative_offsets(
            byte_off, run_starts, block_starts, block_run, blocks_per_run, n
        )
        out_cols[off_names[blob_name]] = _offsets_list_array(
            values, list_off, pa.uint32()
        )

    blk_list_off = np.zeros(n_runs + 1, dtype=np.int64)
    np.cumsum(blocks_per_run, out=blk_list_off[1:])
    columns = {
        "th": pa.array(ths[run_starts].astype(np.uint64), type=pa.uint64()),
        "term": term_arr.take(pa.array(run_starts, type=pa.int64())),
        "salt": pa.array(salts[run_starts].astype(np.uint64), type=pa.uint64()),
        "n_postings": pa.array(run_lengths.astype(np.uint64), type=pa.uint64()),
        "doc_blob": out_cols["doc_blob"],
        "tf_blob": out_cols["tf_blob"],
        "dl_blob": out_cols["dl_blob"],
        "doc_off": out_cols["doc_off"],
        "tf_off": out_cols["tf_off"],
        "dl_off": out_cols["dl_off"],
        "block_last": _offsets_list_array(block_last, blk_list_off, pa.uint64()),
        "block_ub": _offsets_list_array(block_ub, blk_list_off, pa.float32()),
    }
    if impact:
        # impact permutation: run-major, then component DESC, then docID asc
        # (run_ids is valid for the doc-sorted arrays too: the doc-sort is
        # run-major with unchanged run lengths, so run membership per
        # position is identical).  Block geometry (starts/run mapping) is
        # shared with the docID-ordered layout — same run lengths, same
        # fixed block size — so _run_relative_offsets is reused as-is.
        order_imp = np.lexsort((doc_s, -comp, run_ids))
        comp_imp = comp[order_imp]
        imp_streams = {
            "imp_doc_blob": doc_s[order_imp],
            "imp_tf_blob": tf_s[order_imp],
            "imp_dl_blob": dl_s[order_imp],
        }
        imp_offs = {
            "imp_doc_blob": "imp_doc_off",
            "imp_tf_blob": "imp_tf_off",
            "imp_dl_blob": "imp_dl_off",
        }
        for blob_name, stream in imp_streams.items():
            buf, sizes = codec.varint_encode_with_sizes(stream)
            byte_off = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(sizes, out=byte_off[1:])
            run_byte_bounds = byte_off[run_bounds]
            columns[blob_name] = pa.LargeBinaryArray.from_buffers(
                pa.large_binary(),
                n_runs,
                [None, pa.py_buffer(run_byte_bounds.tobytes()), pa.py_buffer(buf)],
            )
            values, list_off = _run_relative_offsets(
                byte_off, run_starts, block_starts, block_run, blocks_per_run, n
            )
            columns[imp_offs[blob_name]] = _offsets_list_array(
                values, list_off, pa.uint32()
            )
        imp_cmax = codec.ub_float32(np.maximum.reduceat(comp_imp, block_starts))
        columns["imp_cmax"] = _offsets_list_array(
            imp_cmax, blk_list_off, pa.float32()
        )
    return pa.table(columns)


def compact_index(
    source: str | Path | list | Store,
    out_dir: str | Path | Store,
    cfg: "BuildConfig | None" = None,
    *,
    filesystem=None,
    source_filesystem=None,
) -> dict:
    """Merge all delta generations back into a single FULL generation per
    wave, crash-safely.

    Long incremental histories fragment per-term chunk lists (the query
    layer merges per-generation chunks and filters superseded salts on
    every lookup).  Compaction re-runs the posting shuffle over ALL shard
    groups from the — unchanged, therefore skipped — ``docs_tok``
    checkpoint (tokenization is NOT repeated) into a NEW generation marked
    ``full``; results are bit-identical (same postings, same stats).

    Crash-safety protocol: old generations are left on disk until the new
    manifest (which references only the full generation) has atomically
    committed, so the previously committed manifest stays fully readable
    at every instant — a kill at ANY point leaves either the old index or
    the new one, never a manifest pointing at deleted files.  Superseded
    records/dirs are garbage-collected afterwards (idempotent: a kill
    mid-cleanup is finished by the next compaction; orphan dirs are never
    referenced and get overwritten by the atomic dir writer if their name
    is ever reused).
    """
    store = Store.resolve(out_dir, filesystem)
    if cfg is None:
        # recover the index's own build config from the committed manifest —
        # compacting with defaults could silently re-tokenize under
        # different settings
        from .manifest import load_manifest

        recorded = dict(load_manifest(store)["config"])
        recorded.pop("term_hasher", None)
        cfg = BuildConfig(**recorded)
    result = build_index(
        source, store, cfg, compact=True, source_filesystem=source_filesystem
    )

    # GC superseded generations — only AFTER the new manifest committed
    manifest = BuildManifest(store)
    all_recs = manifest.load_partitions()
    by_wave: dict[int, list] = {}
    for rec in all_recs.values():
        if rec.stage == "segments":
            by_wave.setdefault(rec.lineage.get("wave"), []).append(rec)
    removed = False
    # snapshot-referenced dirs survive for time-travel readers and expire
    # with their snapshots (manifest.finalize sweep); the just-committed
    # manifest is excluded — its partition list still carries the
    # superseded generation records this loop is collecting
    from .manifest import protected_data_dirs

    protect = protected_data_dirs(store, exclude_current=True)
    for recs in by_wave.values():
        recs.sort(key=lambda r: r.lineage.get("gen", 0))
        base = 0
        for i, r in enumerate(recs):
            if r.lineage.get("full") or r.lineage.get("gen", 0) == 0:
                base = i
        for r in recs[:base]:
            # record first (so a half-done GC never resurrects the gen),
            # then the now-unreferenced files — including the generation's
            # paired term dictionary, which would otherwise orphan
            manifest.delete_partition(r.key())
            for d in _record_dirs(r):
                if d not in protect:
                    store.delete_dir_abs(d)
            td = all_recs.get(f"termdict--{r.partition_id}")
            if td is not None:
                manifest.delete_partition(td.key())
                for d in _record_dirs(td):
                    if d not in protect:
                        store.delete_dir_abs(d)
            removed = True
    if removed:
        # refresh the manifest's informational partition list (waves /
        # wave_gens / stats are unchanged — they already exclude the
        # superseded generations)
        from .manifest import load_manifest

        man = load_manifest(store)
        result = manifest.finalize(
            config=man["config"],
            stats=man["stats"],
            extra={
                k: man[k]
                for k in man
                if k not in ("format_version", "config", "stats", "partitions")
            },
        )
    return result


# --------------------------------------------------------------------------
# build driver
# --------------------------------------------------------------------------


def _effective_pool_size(requested: int) -> int:
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", requested + 1))
    except Exception:
        cpus = requested + 1
    return max(1, min(requested, cpus - 1))


def _encode_task_cpus(max_concurrent: int) -> float:
    """num_cpus for encode tasks so at most ``max_concurrent`` run per node.

    The run encoder is allocation-heavy vectorized C; past ~8 concurrent
    tasks per node the stage is memory-bandwidth / page-fault bound and MORE
    tasks make it SLOWER (measured on this host's cheap-fault mode, 400k
    pages / 27M postings / 64 blocks at a 32-CPU session: 32 concurrent
    9.9-22.4 s, 16 → 5.0-6.6 s, 8 → 2.6-3.7 s).  Reserving
    session_cpus/max_concurrent CPUs per task caps concurrency at the sweet
    spot while leaving the scheduler free to run other stages alongside.
    """
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", max_concurrent))
    except Exception:
        cpus = max_concurrent
    return max(1.0, cpus / max(1, max_concurrent))


def _resolve_source(
    source: str | Path | list | Store, source_filesystem=None
) -> tuple[list[str], "object | None"]:
    """Input parquet file list + the filesystem they live on (None = local)."""
    if isinstance(source, list):
        return sorted(str(f) for f in source), source_filesystem
    if source_filesystem is None and "://" not in str(source) and not isinstance(
        source, Store
    ):
        p = Path(source)  # plain local path: cheap, no Store round-trip
        if p.is_dir():
            return sorted(str(f) for f in p.glob("*.parquet")), None
        return [str(p)], None
    st = Store.resolve(source, source_filesystem)
    import pyarrow.fs as pafs

    info = st.fs.get_file_info(st.base)
    if info.type == pafs.FileType.Directory:
        return st.list_files(suffix=".parquet"), st.fs
    return [st.base], st.fs


def _open_pq(path: str, fs=None) -> pq.ParquetFile:
    return pq.ParquetFile(path if fs is None else fs.open_input_file(path))


def _attempt_dir_write(
    store: Store,
    ds: ray.data.Dataset,
    parent: str,
    pid: str,
    row_group_size: int | None = None,
) -> tuple[list[str], str]:
    """Write a dataset into a fresh ``<pid>--<nonce>/`` attempt directory.

    Returns (parquet file paths, attempt dir name).  Visibility comes from
    committing those paths in the partition record — never from a rename —
    so the identical protocol works on object stores; stale attempts are
    garbage-collected by ``gc_stale_attempts`` after the commit.
    """
    dirname = attempt_dir(pid)
    full = store.path(parent, dirname)
    # an empty dataset writes no files at all — the empty dir still marks
    # the attempt so "built, zero postings" is distinguishable on disk
    store.mkdirs(parent, dirname)
    kwargs = {}
    if row_group_size is not None:
        # small row groups → fine-grained row-group pruning on the query
        # path (a term lookup reads ~row_group_size rows, not a 100k block)
        kwargs["row_group_size"] = row_group_size
    ds.write_parquet(full, filesystem=store.fs, **kwargs)
    return store.list_files(parent, dirname, suffix=".parquet"), dirname


def _record_dirs(rec: PartitionRecord) -> set[str]:
    """Attempt directories referenced by a committed record's file list.

    ``lineage["pinned_dirs"]`` additionally protects directories whose files
    the record no longer lists but the still-committed manifest does — the
    purge protocol (``deletes.purge_deletes``) pins the pre-purge checkpoint
    dirs until the post-purge manifest commits, so a kill at any instant
    leaves the old index fully readable."""
    dirs = {f.rsplit("/", 1)[0] for f in rec.output_files}
    dirs.update(rec.lineage.get("pinned_dirs", []))
    return dirs


def _parquet_rows(files: list[str], fs=None) -> int:
    return sum(_open_pq(f, fs).metadata.num_rows for f in files)


def _th_bounds(files: list[str], fs=None) -> list[list[int]]:
    """Per-file [th_min, th_max] from parquet row-group statistics."""
    out: list[list[int]] = []
    for f in files:
        md = _open_pq(f, fs).metadata
        col = next(
            i for i in range(md.num_columns) if md.schema.column(i).name == "th"
        )
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col).statistics
            if st is None or not st.has_min_max:
                lo, hi = 0, (1 << 64) - 1
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append([int(lo or 0), int(hi if hi is not None else (1 << 64) - 1)])
    return out


def _drop_deleted_urls(batch: pa.Table, deleted_urls: list[str]) -> pa.Table:
    """Filter ledger-deleted urls out of a freshly-read source batch.

    Applied to every group being (re-)tokenized when the index carries a
    deletion ledger (``index/deletes.py``), so a takedown can never
    resurrect through an incremental update, compaction, or streaming
    append.  Lineage docIDs were already assigned from source row positions
    upstream, so dropping rows does not shift surviving docIDs."""
    mask = pc.invert(
        pc.is_in(
            batch.column("url"),
            value_set=pa.array(deleted_urls, type=batch.column("url").type),
        )
    )
    return batch.filter(mask)


def _normalize_pre_extracted(batch: pa.Table) -> pa.Table:
    """normalize_text + drop null/empty rows for pre-extracted text inputs."""
    from ..refimpl.textnorm import normalize_text

    texts = batch.column("text").to_pylist()
    keep_idx: list[int] = []
    normed: list[str] = []
    for i, t in enumerate(texts):
        if t is None:
            continue
        t = normalize_text(t)
        if not t:
            continue
        keep_idx.append(i)
        normed.append(t)
    out = batch.take(pa.array(keep_idx, type=pa.int64()))
    col = out.schema.get_field_index("text")
    return out.set_column(col, "text", pa.array(normed, type=pa.large_string()))


def _column_sum(files: list[str], column: str, fs=None) -> int:
    total = 0
    for f in files:
        tbl = pq.read_table(f, columns=[column], filesystem=fs)
        total += pc.sum(tbl.column(column)).as_py() or 0
    return total


def build_index(
    source: str | Path | list | Store,
    out_dir: str | Path | Store,
    cfg: BuildConfig | None = None,
    *,
    compact: bool = False,
    filesystem=None,
    source_filesystem=None,
) -> dict:
    """Build (or resume) an index at ``out_dir`` from pages parquet shards.

    ``out_dir`` / ``source`` may each be a local path, a ``Store``, or a URI
    (with ``filesystem`` / ``source_filesystem`` overriding the fs) — every
    byte of index IO goes through ``pyarrow.fs``, so the same build runs
    against an object store (no rename anywhere in the commit protocol).

    Returns the final manifest dict.  Safe to re-run: completed partitions
    are skipped via the checkpoint manifest.  With ``compact=True`` every
    wave whose newest generation is not already a full cover is rebuilt
    from ALL shard groups into a new generation marked ``full`` — old
    generations stay on disk (and the previously committed manifest stays
    valid) until ``compact_index`` deletes them after the new manifest
    commit.
    """
    cfg = cfg or BuildConfig()
    store = Store.resolve(out_dir, filesystem)
    store.mkdirs()
    manifest = BuildManifest(store, fail_after_partitions=cfg.fail_after_partitions)
    files, src_fs = _resolve_source(source, source_filesystem)
    if not files:
        raise ValueError(f"no parquet input files under {source}")

    # permanent deleted-urls ledger (index/deletes.py): any group this run
    # (re-)tokenizes drops ledger urls at the read, and the tombstone set is
    # re-resolved against the final checkpoint at finalize — deletions
    # survive incremental updates, compaction, and streaming appends
    from .manifest import manifest_exists

    ledger_urls: list[str] = []
    prior_deletes: dict | None = None
    if manifest_exists(store):
        from .deletes import read_ledger
        from .manifest import load_manifest as _load_man

        try:
            prior_deletes = _load_man(store).get("deletes")
            ledger_urls = read_ledger(store, prior_deletes)
        except FileNotFoundError:
            pass

    # data dirs referenced by retained snapshots: every GC below skips
    # them (time-travel readers stay valid); finalize sweeps them when
    # their snapshots expire from history (index/manifest.py)
    from .manifest import protected_data_dirs

    protect = protected_data_dirs(store)

    # ---- stage 1: extract + tokenize, one partition per shard group -------
    groups = [
        files[i : i + cfg.shard_group_size]
        for i in range(0, len(files), cfg.shard_group_size)
    ]
    # tokenize-relevant config is part of the group fingerprint: changing the
    # tokenizer / doc builder must re-tokenize even when inputs are unchanged
    import json as _tokfp_json

    tok_fp = (
        f"|{cfg.token_pattern}|{cfg.text_only}|{cfg.doc_builder}|{cfg.tokenizer}"
        f"|{cfg.char_limit}|{cfg.pre_extracted}|W{cfg.num_waves}"
        f"|B{int(cfg.wave_bucketed_tok)}"
        f"|X{int(cfg.emit_positions)}"
        f"|E{cfg.embed_dim}:{cfg.embed_mode}"
        f"|M{hashlib.sha1(_tokfp_json.dumps(cfg.bpe_merges).encode()).hexdigest() if cfg.bpe_merges else ''}"
        f"|P{_tokfp_json.dumps(cfg.embed_provider, sort_keys=True)}"
        f"|S{_tokfp_json.dumps(sorted(cfg.stop_words)) if cfg.stop_words else ''}"
    )
    group_fp_now: dict[str, str] = {}
    group_file_indices: dict[str, list[int]] = {}
    for gi, group in enumerate(groups):
        pid = f"group-{gi:05d}"
        fp = hashlib.sha1(
            (file_fingerprint(group, src_fs) + tok_fp).encode()
        ).hexdigest()
        group_fp_now[pid] = fp
        group_file_indices[pid] = list(
            range(gi * cfg.shard_group_size, gi * cfg.shard_group_size + len(group))
        )
        if manifest.is_done("docs_tok", pid, fp):
            # sweep attempt dirs a crashed run left before its commit
            rec = manifest.load_partitions()[f"docs_tok--{pid}"]
            keep = {d.rsplit("/", 1)[-1] for d in _record_dirs(rec)}
            gc_stale_attempts(store, "docs_tok", pid, keep, protect)
            continue
        t0 = time.perf_counter()
        read_cols = ["url", "text"] if cfg.pre_extracted else ["url", "html"]
        ds = read_with_doc_ids(
            group,
            read_cols,
            file_indices=list(
                range(gi * cfg.shard_group_size, gi * cfg.shard_group_size + len(group))
            ),
            filesystem=src_fs,
        )
        if ledger_urls:
            ds = ds.map_batches(
                _drop_deleted_urls,
                fn_kwargs={"deleted_urls": ledger_urls},
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        if not cfg.pre_extracted:
            ds = ds.map_batches(
                make_extract_fn(cfg.char_limit),
                batch_format="pyarrow",
                batch_size=cfg.extract_batch_size,
                zero_copy_batch=True,
            )
        else:
            # pre-extracted inputs get the same normalize-and-drop-empty the
            # extraction path applies (refimpl.oracle:66-72 parity): without
            # it, whitespace-only rows survive as doc_len=0 ghosts and skew
            # doc_count / avg_doc_len / idf vs the oracle
            ds = ds.map_batches(
                _normalize_pre_extracted,
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        ds = ds.map_batches(
            TokenizeDocs,
            fn_constructor_kwargs={
                "text_only": cfg.text_only,
                "token_pattern": cfg.token_pattern,
                "doc_builder": cfg.doc_builder,
                "tokenizer": cfg.tokenizer,
                "num_waves": cfg.num_waves if cfg.wave_bucketed_tok else 0,
                "embed_dim": cfg.embed_dim,
                "embed_mode": cfg.embed_mode,
                "embed_provider": cfg.embed_provider,
                "bpe_merges": cfg.bpe_merges,
                "stop_words": cfg.stop_words,
                "emit_positions": cfg.emit_positions,
            },
            batch_format="pyarrow",
            batch_size=cfg.tokenize_batch_size,
            # FIXED pool size: an autoscaling (1, N) pool ramps up too slowly
            # to ever reach N within a stage, silently serializing the build.
            # Clamped below the session CPU count so reads and writes keep
            # running alongside the pool (a pool that reserves every CPU
            # deadlocks the stage).
            concurrency=_effective_pool_size(cfg.tokenize_concurrency),
            zero_copy_batch=True,
        )
        out_files, dirname = _attempt_dir_write(store, ds, "docs_tok", pid)
        rows_out = _parquet_rows(out_files, store.fs)
        manifest.commit_partition(
            PartitionRecord(
                stage="docs_tok",
                partition_id=pid,
                input_fingerprint=fp,
                output_files=out_files,
                metrics={
                    "rows_in": _parquet_rows(group, src_fs),
                    "rows_out": rows_out,
                    "tokens": _column_sum(out_files, "doc_len", store.fs),
                    "wall_s": round(time.perf_counter() - t0, 3),
                },
                lineage={"input_files": group, "config": cfg.public_dict()},
            )
        )
        gc_stale_attempts(store, "docs_tok", pid, {dirname}, protect)

    # ---- stage 2: corpus stats (docIDs already assigned from lineage) ------
    # the docs_tok checkpoint IS the docs table: (doc_id, url, doc_len,
    # terms, tfs); stats are exact global aggregates over its doc_len column.
    # Files come from THIS run's committed group records — never a directory
    # glob, which would silently fold stale checkpoints from an earlier build
    # with a different input plan into doc_count / idf as ghost documents.
    parts = manifest.load_partitions()
    current_pids = [f"group-{gi:05d}" for gi in range(len(groups))]
    all_tok_files = sorted(
        f
        for pid in current_pids
        for f in parts[f"docs_tok--{pid}"].output_files
    )
    # drop attempt dirs belonging to groups outside the current input plan
    # (referenced dirs of current groups were already swept per group above)
    referenced = {
        d.rsplit("/", 1)[-1]
        for pid in current_pids
        for d in _record_dirs(parts[f"docs_tok--{pid}"])
    }
    current_pid_set = set(current_pids)
    for name in store.subdirs("docs_tok"):
        if (
            attempt_pid(name) not in current_pid_set
            and name not in referenced
            and store.path("docs_tok", name) not in protect
        ):
            store.delete_dir("docs_tok", name)
    docs_fp = hashlib.sha1(
        (file_fingerprint(files, src_fs) + tok_fp).encode()
    ).hexdigest()
    if not manifest.is_done("docs", "global", docs_fp):
        t0 = time.perf_counter()
        doc_count = _parquet_rows(all_tok_files, store.fs)
        total_len = _column_sum(all_tok_files, "doc_len", store.fs)
        manifest.commit_partition(
            PartitionRecord(
                stage="docs",
                partition_id="global",
                input_fingerprint=docs_fp,
                output_files=all_tok_files,
                metrics={
                    "doc_count": doc_count,
                    "total_doc_len": total_len,
                    "wall_s": round(time.perf_counter() - t0, 3),
                },
                lineage={"inputs": "docs_tok/*", "config": cfg.public_dict()},
            )
        )
    docs_rec = manifest.load_partitions()["docs--global"]
    docs_files = docs_rec.output_files
    doc_count = docs_rec.metrics["doc_count"]
    total_len = docs_rec.metrics["total_doc_len"]
    avg_doc_len = total_len / doc_count if doc_count else 0.0

    # ---- stage 3: per-wave posting shuffle + encode + segment write --------
    # Generation planning fingerprints the group's CHECKPOINT OUTPUT, not
    # just the source content: a purge (index/deletes.py) rewrites docs_tok
    # files without touching the source, and the posting generations must
    # notice — otherwise a compacting build would skip "already full" waves
    # whose segments still carry the purged docs' postings.
    parts_after_tok = manifest.load_partitions()
    seg_fp_now: dict[str, str] = {
        pid: hashlib.sha1(
            (
                group_fp_now[pid]
                + "|"
                + "|".join(
                    sorted(parts_after_tok[f"docs_tok--{pid}"].output_files)
                )
            ).encode()
        ).hexdigest()
        for pid in current_pids
    }
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    prev_strategy = ctx.shuffle_strategy
    prev_max_agg = ctx.max_hash_shuffle_aggregators
    if cfg.shuffle_backend == "hash":
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        # bound aggregator actor count: too many concurrent actor spawns
        # destabilize small nodes and buy nothing on one machine
        ctx.max_hash_shuffle_aggregators = min(8, cfg.partitions_per_wave)
    import json as _json

    _fp_cfg = cfg.public_dict()
    _fp_cfg.pop("manifest_history", None)  # retention policy, not content
    cfg_fp = hashlib.sha1(
        _json.dumps(_fp_cfg, sort_keys=True).encode()
    ).hexdigest()
    try:
        for wave in range(cfg.num_waves):
            # ---- generation planning (row-level incrementality) ----------
            # Each committed segment partition is one GENERATION of this
            # wave: gen 0 covers every shard group; later gens re-index only
            # the groups whose content fingerprint changed.  A group's docID
            # range is a whole number of salt ranges (salt_shift <= 32), so
            # the query layer drops superseded postings at chunk granularity
            # — reference behavior analogue: vexor re-indexes only changed
            # files (services/index_service.py:565-643).
            parts_now = manifest.load_partitions()
            gens = sorted(
                (
                    r
                    for r in parts_now.values()
                    if r.stage == "segments" and r.lineage.get("wave") == wave
                ),
                key=lambda r: r.lineage.get("gen", 0),
            )
            prev_cover: dict[str, str] = {}
            for r in gens:
                prev_cover.update(r.lineage.get("group_fps", {}))
            # APPEND-friendly: new shard groups (prev_cover ⊂ group_fp_now —
            # the streaming-ingestion path, files named to sort after the
            # existing corpus so lineage docIDs of old files are stable) are
            # just dirty additions; only group REMOVAL / renames (a group in
            # prev_cover missing now) force a clean rebuild, because docID
            # ranges of surviving files would shift under them.
            incremental = (
                bool(gens)
                and all(r.lineage.get("cfg_fp") == cfg_fp for r in gens)
                and set(prev_cover) <= set(seg_fp_now)
                and all(
                    store.exists_abs(f) for r in gens for f in r.output_files
                )
            )
            if incremental:
                dirty = sorted(
                    gid
                    for gid, fp in seg_fp_now.items()
                    if prev_cover.get(gid) != fp
                )
                last_full = gens[-1].lineage.get("full") or (
                    gens[-1].lineage.get("gen", 0) == 0
                )
                if compact:
                    if not dirty and last_full:
                        continue  # newest gen already covers everything
                    dirty = sorted(seg_fp_now)  # full cover into a new gen
                elif not dirty:
                    continue  # wave fully up to date
                next_gen = gens[-1].lineage.get("gen", 0) + 1
            else:
                # config / input-plan change (or first build): wipe stale
                # generations and rebuild this wave from all groups
                # (snapshot-referenced dirs stay for time-travel readers)
                for r in gens:
                    manifest.delete_partition(r.key())
                    for d in _record_dirs(r):
                        if d not in protect:
                            store.delete_dir_abs(d)
                dirty = sorted(seg_fp_now)
                next_gen = 0
            pid = f"wave-{wave:04d}-gen-{next_gen:04d}"
            wave_fp = hashlib.sha1(
                (
                    "|".join(f"{g}:{seg_fp_now[g]}" for g in dirty)
                    + f"|{wave}|{cfg.num_waves}|{cfg.salt_shift}|"
                    f"{cfg.block_size}|{cfg.k1}|{cfg.b}|{avg_doc_len!r}"
                ).encode()
            ).hexdigest()
            gen_lineage = {
                "wave": wave,
                "gen": next_gen,
                "cfg_fp": cfg_fp,
                "avgdl": avg_doc_len,
                # a FULL generation covers every group and supersedes all
                # earlier generations (gen 0 is implicitly full)
                "full": next_gen == 0 or set(dirty) == set(seg_fp_now),
                "group_fps": {g: seg_fp_now[g] for g in dirty},
                "covers_files": sorted(
                    fi for g in dirty for fi in group_file_indices[g]
                ),
                "config": cfg.public_dict(),
            }
            if doc_count == 0:
                manifest.commit_partition(
                    PartitionRecord(
                        stage="segments",
                        partition_id=pid,
                        input_fingerprint=wave_fp,
                        metrics={"postings": 0, "chunk_rows": 0, "wall_s": 0.0},
                        lineage=gen_lineage,
                    )
                )
                continue
            t0 = time.perf_counter()
            dirty_files = sorted(
                f
                for g in dirty
                for f in parts_now[f"docs_tok--{g}"].output_files
            )
            # bound the block count into the sort: the sort-shuffle creates
            # (#map blocks x #output partitions) intermediate objects, which
            # at fine block granularity melts the scheduler (observed 4x data
            # -> 20x wave time); 2x partitions_per_wave blocks keeps the
            # exchange quadratic-in-partitions, not in input files
            if cfg.wave_bucketed_tok and cfg.num_waves > 1:
                tcol, fcol = f"terms_w{wave}", f"tfs_w{wave}"
                wave_arg = None  # bucketed at tokenize time, nothing to filter
            else:
                tcol, fcol = "terms", "tfs"
                wave_arg = wave if cfg.num_waves > 1 else None
            ds = ray.data.read_parquet(
                dirty_files,
                columns=["doc_id", "doc_len", tcol, fcol],
                override_num_blocks=cfg.partitions_per_wave * 2,
                filesystem=store.fs,
            )
            ds = ds.map_batches(
                explode_postings,
                fn_kwargs={
                    "salt_shift": cfg.salt_shift,
                    "num_waves": cfg.num_waves,
                    "wave": wave_arg,
                    "terms_col": tcol,
                    "tfs_col": fcol,
                },
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            if cfg.shuffle_backend == "hash":
                ds = ds.repartition(
                    cfg.partitions_per_wave, keys=["th", "salt"], sort=True
                )
            else:
                # range sort on the uint64 hash key (string-free compares):
                # same complete-runs-per-block property in the common case; a
                # run split across block boundaries yields two chunk rows for
                # one (term, salt), which the query layer merges (multi-chunk
                # terms are first-class: salting already produces them)
                ds = ds.sort(["th", "salt"])
            ds = ds.map_batches(
                encode_runs,
                fn_kwargs={
                    "avg_doc_len": avg_doc_len,
                    "block_size": cfg.block_size,
                    "k1": cfg.k1,
                    "b": cfg.b,
                    "impact": cfg.impact_postings,
                    "posting_codec": cfg.posting_codec,
                },
                batch_format="pyarrow",
                batch_size=None,
                zero_copy_batch=True,
                num_cpus=(
                    _encode_task_cpus(cfg.encode_max_concurrent)
                    if cfg.encode_max_concurrent
                    else 1.0
                ),
            )
            seg_files, seg_dirname = _attempt_dir_write(
                store, ds, "segments", pid, row_group_size=2048
            )
            manifest.commit_partition(
                PartitionRecord(
                    stage="segments",
                    partition_id=pid,
                    input_fingerprint=wave_fp,
                    output_files=seg_files,
                    metrics={
                        "chunk_rows": _parquet_rows(seg_files, store.fs),
                        "postings": _column_sum(seg_files, "n_postings", store.fs),
                        "bytes": sum(store.file_size_abs(f) for f in seg_files),
                        "wall_s": round(time.perf_counter() - t0, 3),
                    },
                    lineage=gen_lineage,
                )
            )
            gc_stale_attempts(store, "segments", pid, {seg_dirname}, protect)
    finally:
        ctx.shuffle_strategy = prev_strategy
        ctx.max_hash_shuffle_aggregators = prev_max_agg

    # ---- term dictionary sidecar (one per segments generation) ------------
    # Sorted distinct (term, df) rows: prefix/wildcard expansion needs
    # lexicographic access that the th-hash-keyed segment layout cannot
    # provide (hashing destroys term order).  Vocabulary-sized, not
    # postings-sized — a driver-side columnar aggregate per generation —
    # and committed under the same attempt-dir + record protocol, so a
    # killed build resumes past completed dictionaries.
    for rec in list(manifest.load_partitions().values()):
        if rec.stage != "segments":
            continue
        pid = rec.partition_id
        td_fp = hashlib.sha1("|".join(sorted(rec.output_files)).encode()).hexdigest()
        if manifest.is_done("termdict", pid, td_fp):
            tdrec = manifest.load_partitions()[f"termdict--{pid}"]
            keep = {d.rsplit("/", 1)[-1] for d in _record_dirs(tdrec)}
            gc_stale_attempts(store, "termdict", pid, keep, protect)
            continue
        t0 = time.perf_counter()
        out_files: list[str] = []
        dirname = None
        if rec.output_files:
            parts = [
                _open_pq(f, store.fs).read(columns=["term", "n_postings"])
                for f in rec.output_files
            ]
            tbl = pa.concat_tables(parts)
            agg = pa.TableGroupBy(tbl, "term").aggregate([("n_postings", "sum")])
            agg = agg.sort_by("term")
            dict_tbl = pa.table(
                {
                    "term": agg.column("term"),
                    "df": pc.cast(agg.column("n_postings_sum"), pa.uint64()),
                }
            )
            dirname = attempt_dir(pid)
            store.mkdirs("termdict", dirname)
            dest = f"{store.path('termdict', dirname)}/dict.parquet"
            pq.write_table(
                dict_tbl, dest, filesystem=store.fs, row_group_size=8192
            )
            out_files = store.list_files("termdict", dirname, suffix=".parquet")
        manifest.commit_partition(
            PartitionRecord(
                stage="termdict",
                partition_id=pid,
                input_fingerprint=td_fp,
                output_files=out_files,
                metrics={
                    "terms": int(dict_tbl.num_rows) if out_files else 0,
                    "wall_s": round(time.perf_counter() - t0, 3),
                },
                lineage={
                    "wave": rec.lineage.get("wave"),
                    "gen": rec.lineage.get("gen", 0),
                },
            )
        )
        if dirname is not None:
            gc_stale_attempts(store, "termdict", pid, {dirname}, protect)

    # ---- finalize ----------------------------------------------------------
    # waves        — flat file lists (all generations), for simple consumers;
    # wave_gens    — per-wave generation list in ascending gen order with the
    #                file-index coverage + encode-time avgdl the query layer
    #                needs to drop superseded chunks and rescale WAND bounds
    termdict_by_pid = {
        rec.partition_id: rec.output_files
        for rec in manifest.load_partitions().values()
        if rec.stage == "termdict"
    }
    wave_gens: dict[int, list[dict]] = {}
    for rec in manifest.load_partitions().values():
        if rec.stage == "segments":
            wave_gens.setdefault(rec.lineage["wave"], []).append(
                {
                    "gen": rec.lineage.get("gen", 0),
                    "full": bool(
                        rec.lineage.get("full")
                        or rec.lineage.get("gen", 0) == 0
                    ),
                    "files": rec.output_files,
                    # per-file th min/max from the parquet footers, recorded
                    # once at build commit so every query process can prune
                    # segment files per term without its own footer sweep
                    "th_bounds": _th_bounds(rec.output_files, store.fs),
                    "covers_files": rec.lineage.get("covers_files", []),
                    "avgdl": rec.lineage.get("avgdl", avg_doc_len),
                    "termdict": termdict_by_pid.get(rec.partition_id, []),
                }
            )
    for w, gens in wave_gens.items():
        gens.sort(key=lambda g: g["gen"])
        # generations older than the newest FULL one are superseded in
        # their entirety: the manifest exposes only the live suffix (the
        # stale dirs/records are garbage-collected by compact_index AFTER
        # this manifest commits, so readers never see dangling files)
        base = max(
            (i for i, g in enumerate(gens) if g["full"]), default=0
        )
        wave_gens[w] = gens[base:]
    extra = {
        "input_files": files,
        "input_fingerprint": file_fingerprint(files, src_fs),
        "docs_files": docs_files,
        "waves": {
            str(w): [f for g in gens for f in g["files"]]
            for w, gens in sorted(wave_gens.items())
        },
        "wave_gens": {
            str(w): gens for w, gens in sorted(wave_gens.items())
        },
    }
    if ledger_urls:
        # re-resolve the deletion ledger against the final checkpoint: docs
        # physically absent (ledger-filtered or purged) drop out, so the
        # tombstone set always covers exactly the deleted docs still present
        from .deletes import gc_delete_objects, refresh_resolution

        extra["deletes"] = refresh_resolution(
            store, prior_deletes, docs_files, ledger_urls
        )
    result = manifest.finalize(
        config=cfg.public_dict(),
        stats={
            "doc_count": doc_count,
            "total_doc_len": total_len,
            "avg_doc_len": avg_doc_len,
        },
        extra=extra,
    )
    if ledger_urls:
        gc_delete_objects(store, extra["deletes"])
    return result
