"""Positional posting sidecar + exact phrase matching.

Beyond-reference fulltext capability: the reference scores bags of words
only (``vexor/bm25.py:64-89`` — postings are ``(chunk_id, tf)``, token
order is discarded at ``Counter`` time), so it cannot answer phrase
queries.  This sidecar stores, per (term, salt) chunk, every 1-based token
position of the term in each document, enabling exact consecutive-token
phrase matching.

It is a SEPARATE opt-in index directory (positions roughly double the raw
token data — the wrong default at 100 TB) that reuses the engine's
object-store-ready build machinery end to end: lineage docIDs
(``stages/docids.py``), the extract/tokenize actor pool shape, attempt-dir
writes + partition-record commits + pointer-swap manifest
(``index/storage.py`` / ``index/manifest.py``), so a killed build resumes
at stage/partition granularity on any ``pyarrow.fs``.

Layout per (term, salt) chunk, docIDs ascending (one parquet row):

- ``doc_blob``: varint docID deltas (``delta[0] = doc[0]``);
- ``cnt_blob``: varint positions-count per posting (the positional tf);
- ``pos_blob``: varint 1-based positions, delta-coded WITHIN each posting
  (ascending per doc, so gaps are small).

Query (``phrase_occurrences``): tokenize the phrase WITHOUT dedup/cap
(order and repeats are the semantics — unlike BM25's
``preprocess_query``), decode each term's postings, map docIDs into the
rarest term's dense index, then chain-intersect ``idx * 2^32 + pos`` keys:
occurrences of ``t0 .. tn`` are ``keys(t0) ∩ (keys(t1) - 1) ∩ ... ∩
(keys(tn) - n)`` — each step one ``np.intersect1d`` over sorted unique
uint64 arrays, no per-doc Python.
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
import pyarrow.dataset as pads
import ray.data

from ..hashing import file_fingerprint, hash_terms
from ..spec import DEFAULT_SALT_SHIFT, FULL_CHAR_LIMIT, TOKEN_PATTERN
from . import codec
from .manifest import BuildManifest, PartitionRecord, load_manifest
from .storage import Store, gc_stale_attempts

_POS_BASE = np.uint64(1) << np.uint64(32)  # doc-index stride in chain keys


@dataclass
class PositionsConfig:
    token_pattern: str = TOKEN_PATTERN
    tokenizer: str = "regex"  # regex | bert_union (must match the BM25 index)
    # analyzer stopword list — MUST match the paired BM25 index's, or
    # phrase/NEAR position arithmetic diverges from query tokenization
    stop_words: list | None = None
    text_only: bool = True  # phrase semantics over the text itself
    pre_extracted: bool = False
    # tokenized_source → ``source`` is a docs_tok checkpoint that already
    # carries (doc_id, terms, poss) — a BM25 build with
    # ``BuildConfig(emit_positions=True)``.  Stage 1 (extract + tokenize)
    # is skipped entirely: ONE tokenize pass serves both indexes.
    tokenized_source: bool = False
    char_limit: int = FULL_CHAR_LIMIT
    salt_shift: int = DEFAULT_SALT_SHIFT
    num_waves: int = 1
    partitions_per_wave: int = 8
    shard_group_size: int = 8
    tokenize_batch_size: int = 1024
    tokenize_concurrency: int = 4
    fail_after_partitions: int | None = None

    def public_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d.pop("fail_after_partitions")
        return d


class TokenizePositions:
    """Actor-pool callable: per-doc term → 1-based position lists.

    Positions index into the tokenizer's output sequence for the document
    (1-based, matching SQL ``generate_series(1, len(toks))`` twins).
    """

    def __init__(
        self,
        text_only: bool = True,
        token_pattern: str = TOKEN_PATTERN,
        tokenizer: str = "regex",
        stop_words: list | None = None,
    ):
        from ..stages.berttok import make_tokenizer

        self._tokenize = make_tokenizer(
            tokenizer, token_pattern, stop_words=stop_words
        )
        self._text_only = text_only

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        docs = texts if self._text_only else [f"{u} {t}" for u, t in zip(urls, texts)]
        terms_col: list[list[str]] = []
        poss_col: list[list[list[int]]] = []
        for doc in docs:
            by_term: dict[str, list[int]] = {}
            for i, tok in enumerate(self._tokenize(doc), start=1):
                by_term.setdefault(tok, []).append(i)
            terms_col.append(list(by_term.keys()))
            poss_col.append(list(by_term.values()))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "terms": pa.array(terms_col, type=pa.list_(pa.string())),
                "poss": pa.array(
                    poss_col, type=pa.list_(pa.list_(pa.uint32()))
                ),
            }
        )


def explode_position_postings(batch: pa.Table, *, salt_shift: int) -> pa.Table:
    """(doc_id, terms, poss) → flat (th, term, salt, doc_id, poss) rows."""
    batch = batch.combine_chunks()
    if batch.num_rows == 0:
        return pa.table(
            {
                "th": pa.array([], type=pa.uint64()),
                "term": pa.array([], type=pa.string()),
                "salt": pa.array([], type=pa.uint64()),
                "doc_id": pa.array([], type=pa.uint64()),
                "poss": pa.array([], type=pa.list_(pa.uint32())),
            }
        )
    terms_list = batch.column("terms")
    flat_terms = pc.list_flatten(terms_list)
    parent = pc.list_parent_indices(terms_list)
    doc_ids = pc.cast(pc.take(batch.column("doc_id"), parent), pa.uint64())
    poss = pc.list_flatten(batch.column("poss"))  # outer flatten only
    if isinstance(flat_terms, pa.ChunkedArray):
        flat_terms = flat_terms.combine_chunks()
    # dictionary-space hashing (Zipfian streams have ~1% uniques)
    de = pc.dictionary_encode(flat_terms)
    uniq = np.asarray(de.dictionary.to_numpy(zero_copy_only=False), dtype=object)
    hu = hash_terms(uniq)
    th = hu.view(np.int64)[de.indices.to_numpy()].view(np.uint64)
    return pa.table(
        {
            "th": pa.array(th, type=pa.uint64()),
            "term": flat_terms,
            "salt": pc.shift_right(doc_ids, pa.scalar(salt_shift, pa.uint64())),
            "doc_id": doc_ids,
            "poss": poss,
        }
    )


_POS_CHUNK_SCHEMA = pa.schema(
    [
        ("th", pa.uint64()),
        ("term", pa.string()),
        ("salt", pa.uint64()),
        ("n_postings", pa.uint64()),
        ("doc_blob", pa.large_binary()),
        ("cnt_blob", pa.large_binary()),
        ("pos_blob", pa.large_binary()),
    ]
)


def encode_position_runs(batch: pa.Table) -> pa.Table:
    """Encode complete (term, salt) runs of a key-sorted block — vectorized
    like ``build.encode_runs``: one lexsort, one varint pass per stream,
    per-run blobs assembled from byte-size prefix sums."""
    batch = batch.combine_chunks()
    n = batch.num_rows
    if n == 0:
        return _POS_CHUNK_SCHEMA.empty_table()
    term_col = batch.column("term")
    term_arr = term_col.chunk(0) if isinstance(term_col, pa.ChunkedArray) else term_col
    ths = batch.column("th").to_numpy()
    salts = batch.column("salt").to_numpy()
    doc_ids = batch.column("doc_id").to_numpy()
    poss_col = batch.column("poss")
    poss_arr = (
        poss_col.chunk(0) if isinstance(poss_col, pa.ChunkedArray) else poss_col
    )

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
    run_bounds = np.concatenate([run_starts, [n]])

    order = np.lexsort((doc_ids, run_ids))
    doc_s = doc_ids[order].astype(np.uint64)
    poss_s = poss_arr.take(pa.array(order, type=pa.int64()))

    deltas = doc_s.copy()
    deltas[1:] -= doc_s[:-1]
    deltas[run_starts] = doc_s[run_starts]

    # list_value_length + list_flatten respect the taken array's offsets
    # (raw .values/.offsets on a taken ListArray are not guaranteed aligned)
    cnt_i64 = pc.list_value_length(poss_s).to_numpy().astype(np.int64)
    flat_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(cnt_i64, out=flat_off[1:])
    cnts = cnt_i64.astype(np.uint64)
    flat_pos = pc.list_flatten(poss_s).to_numpy().astype(np.uint64)
    # delta-code positions within each posting (first stays absolute);
    # zero-length postings cannot occur (a term present in a doc has >= 1
    # position), so every flat_off[:-1] start index is a real element
    pos_deltas = flat_pos.copy()
    pos_deltas[1:] -= flat_pos[:-1]
    starts = flat_off[:-1]
    pos_deltas[starts] = flat_pos[starts]

    def run_blob(stream: np.ndarray, elem_bounds: np.ndarray) -> pa.Array:
        """varint-encode ``stream``; slice into per-run LargeBinary by the
        element index bounds (length n_runs + 1)."""
        buf, sizes = codec.varint_encode_with_sizes(stream)
        byte_off = np.zeros(stream.size + 1, dtype=np.int64)
        np.cumsum(sizes, out=byte_off[1:])
        bounds = byte_off[elem_bounds]
        return pa.LargeBinaryArray.from_buffers(
            pa.large_binary(),
            n_runs,
            [None, pa.py_buffer(bounds.tobytes()), pa.py_buffer(buf)],
        )

    return pa.table(
        {
            "th": pa.array(ths[run_starts].astype(np.uint64), type=pa.uint64()),
            "term": term_arr.take(pa.array(run_starts, type=pa.int64())),
            "salt": pa.array(salts[run_starts].astype(np.uint64), type=pa.uint64()),
            "n_postings": pa.array(run_lengths.astype(np.uint64), type=pa.uint64()),
            "doc_blob": run_blob(deltas, run_bounds),
            "cnt_blob": run_blob(cnts, run_bounds),
            "pos_blob": run_blob(pos_deltas, flat_off[run_bounds]),
        }
    )


def decode_position_chunk(chunk: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One chunk → (doc_ids, cnts, flat absolute positions)."""
    doc_ids = np.cumsum(codec.varint_decode(chunk["doc_blob"]), dtype=np.uint64)
    cnts = codec.varint_decode(chunk["cnt_blob"])
    pos_deltas = codec.varint_decode(chunk["pos_blob"])
    if pos_deltas.size == 0:
        return doc_ids, cnts, pos_deltas
    csum = np.cumsum(pos_deltas, dtype=np.uint64)
    starts = np.zeros(cnts.size, dtype=np.int64)
    np.cumsum(cnts[:-1].astype(np.int64), out=starts[1:])
    # absolute[j] = csum[j] - (csum[start_of_its_posting] - first_delta)
    base = csum[starts] - pos_deltas[starts]
    flat_pos = csum - np.repeat(base, cnts.astype(np.int64))
    return doc_ids, cnts, flat_pos


def build_positions_index(
    source: str | Path | list | Store,
    out_dir: str | Path | Store,
    cfg: PositionsConfig | None = None,
    *,
    compact: bool = False,
    filesystem=None,
    source_filesystem=None,
) -> dict:
    """Build (or resume) the positional sidecar at ``out_dir``.

    Same two-stage shape as the BM25 build: a resumable tokenized-positions
    checkpoint (one partition per shard group), then one sorted exchange +
    encode per wave.  Every partition commit is an attempt-dir write + a
    record; the final manifest commits by pointer swap — identical
    object-store discipline to ``build.build_index``.
    """
    from .build import (
        _attempt_dir_write,
        _normalize_pre_extracted,
        _parquet_rows,
        _record_dirs,
        _resolve_source,
        _th_bounds,
        _effective_pool_size,
    )
    from ..stages.docids import read_with_doc_ids
    from ..stages.extract import make_extract_fn

    cfg = cfg or PositionsConfig()
    store = Store.resolve(out_dir, filesystem)
    store.mkdirs()
    manifest = BuildManifest(store, fail_after_partitions=cfg.fail_after_partitions)
    files, src_fs = _resolve_source(source, source_filesystem)
    if not files:
        raise ValueError(f"no parquet input files under {source}")

    # ---- stage 1: tokenize with positions, per shard group -----------------
    groups = [
        files[i : i + cfg.shard_group_size]
        for i in range(0, len(files), cfg.shard_group_size)
    ]
    tok_fp = hashlib.sha1(
        f"{cfg.tokenizer}|{cfg.token_pattern}|{cfg.text_only}|pos".encode()
    ).hexdigest()
    parts_files: list[str] = []
    group_fp_now: dict[str, str] = {}
    group_parts: dict[str, list[str]] = {}
    group_file_idx: dict[str, list[int]] = {}
    if cfg.tokenized_source:
        # the source files ARE the tokenized checkpoint (shared with the
        # BM25 build): no pos_tok stage, stage 2 reads them directly
        for gi, group in enumerate(groups):
            pid = f"group-{gi:05d}"
            fp = hashlib.sha1(
                (file_fingerprint(group, src_fs) + tok_fp).encode()
            ).hexdigest()
            group_fp_now[pid] = fp
            group_file_idx[pid] = list(
                range(
                    gi * cfg.shard_group_size,
                    gi * cfg.shard_group_size + len(group),
                )
            )
            group_parts[pid] = [str(f) for f in group]
            parts_files.extend(str(f) for f in group)
        groups = []
    for gi, group in enumerate(groups):
        pid = f"group-{gi:05d}"
        fp = hashlib.sha1(
            (file_fingerprint(group, src_fs) + tok_fp).encode()
        ).hexdigest()
        group_fp_now[pid] = fp
        group_file_idx[pid] = list(
            range(gi * cfg.shard_group_size, gi * cfg.shard_group_size + len(group))
        )
        if manifest.is_done("pos_tok", pid, fp):
            rec = manifest.load_partitions()[f"pos_tok--{pid}"]
            keep = {d.rsplit("/", 1)[-1] for d in _record_dirs(rec)}
            gc_stale_attempts(store, "pos_tok", pid, keep)
            parts_files.extend(rec.output_files)
            group_parts[pid] = list(rec.output_files)
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
        if not cfg.pre_extracted:
            ds = ds.map_batches(
                make_extract_fn(cfg.char_limit),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        else:
            ds = ds.map_batches(
                _normalize_pre_extracted, batch_format="pyarrow", zero_copy_batch=True
            )
        ds = ds.map_batches(
            TokenizePositions,
            fn_constructor_kwargs={
                "text_only": cfg.text_only,
                "token_pattern": cfg.token_pattern,
                "tokenizer": cfg.tokenizer,
                "stop_words": cfg.stop_words,
            },
            batch_format="pyarrow",
            batch_size=cfg.tokenize_batch_size,
            concurrency=_effective_pool_size(cfg.tokenize_concurrency),
            zero_copy_batch=True,
        )
        out_files, dirname = _attempt_dir_write(store, ds, "pos_tok", pid)
        manifest.commit_partition(
            PartitionRecord(
                stage="pos_tok",
                partition_id=pid,
                input_fingerprint=fp,
                output_files=out_files,
                metrics={
                    "rows": _parquet_rows(out_files, store.fs),
                    "wall_s": round(time.perf_counter() - t0, 3),
                },
            )
        )
        gc_stale_attempts(store, "pos_tok", pid, {dirname})
        parts_files.extend(out_files)
        group_parts[pid] = list(out_files)

    # ---- stage 2: explode → sorted exchange → encode, per wave -------------
    # GENERATIONS (the BM25 build's incremental shape, simplified — no
    # global stats, so no avgdl rescale): a changed shard group appends a
    # small delta generation per wave covering only its files; the query
    # layer drops chunks whose file index was re-indexed by a later
    # generation (salt ranges nest inside file docID ranges, so supersede is
    # exact at chunk granularity).  Shrinking the input file set forces a
    # full rebuild (same contract as the BM25 path).
    recs = manifest.load_partitions()
    for wave in range(max(1, cfg.num_waves)):
        # prior generations whose files all still exist, ascending
        prior: list[tuple[int, PartitionRecord]] = []
        for key, rec in recs.items():
            if rec.stage != "positions" or rec.lineage.get("wave") != wave:
                continue
            if all(store.exists_abs(f) for f in rec.output_files):
                prior.append((int(rec.lineage.get("gen", 0)), rec))
        prior.sort()
        known_fps: dict[str, str] = {}
        known_files: set[int] = set()
        for _, rec in prior:
            known_fps.update(rec.lineage.get("group_fps", {}))
            known_files.update(rec.lineage.get("covers_files", []))
        current_files = {fi for idxs in group_file_idx.values() for fi in idxs}
        # shrinking detection must compare FILE INDEX coverage, not group
        # ids: dropping a trailing file leaves every group id alive but its
        # old chunks unsuperseded (a delta gen only covers current files)
        shrunk = (
            any(p not in group_fp_now for p in known_fps)
            or bool(known_files - current_files)
        )
        if shrunk or not prior:
            dirty = sorted(group_fp_now)
            next_gen = 0
        elif compact and len(prior) > 1:
            # compaction: a NEW generation covering every group supersedes
            # the fragmented history; the old generations stay on disk (and
            # the previously committed manifest stays valid) until
            # compact_positions_index GCs them after the new commit
            dirty = sorted(group_fp_now)
            next_gen = prior[-1][0] + 1
        else:
            dirty = sorted(
                p for p, fp in group_fp_now.items() if known_fps.get(p) != fp
            )
            next_gen = prior[-1][0] + 1
        if prior and not dirty and not shrunk:
            for _, rec in prior:
                keep = {d.rsplit("/", 1)[-1] for d in _record_dirs(rec)}
                gc_stale_attempts(store, "positions", rec.partition_id, keep)
            continue
        if next_gen == 0:
            # full rebuild supersedes everything: drop stale records so the
            # finalize below only sees the live generation
            for _, rec in prior:
                manifest.delete_partition(rec.key())
        pid = f"wave-{wave:04d}-gen-{next_gen:04d}"
        dirty_files = sorted(f for p in dirty for f in group_parts[p])
        gen_fp = hashlib.sha1(
            ("|".join(dirty_files) + f"|{cfg.salt_shift}|{wave}").encode()
        ).hexdigest()
        t0 = time.perf_counter()
        ds = ray.data.read_parquet(
            dirty_files,
            columns=["doc_id", "terms", "poss"],
            override_num_blocks=cfg.partitions_per_wave * 2,
            # tokenized_source reads the BM25 build's checkpoint in place
            # (its store may be a different pyarrow.fs than ours)
            filesystem=src_fs if cfg.tokenized_source else store.fs,
        )
        ds = ds.map_batches(
            explode_position_postings,
            fn_kwargs={"salt_shift": cfg.salt_shift},
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        if cfg.num_waves > 1:
            w = np.uint64(cfg.num_waves)
            wv = np.uint64(wave)

            def in_wave(batch: pa.Table, _w=w, _wv=wv) -> pa.Table:
                th = batch.column("th").to_numpy()
                return batch.filter(pa.array((th % _w) == _wv))

            ds = ds.map_batches(in_wave, batch_format="pyarrow", zero_copy_batch=True)
        ds = ds.sort(["th", "salt"])
        ds = ds.map_batches(
            encode_position_runs,
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
        )
        out_files, dirname = _attempt_dir_write(
            store, ds, "positions", pid, row_group_size=2048
        )
        bounds = _th_bounds(out_files, store.fs)
        manifest.commit_partition(
            PartitionRecord(
                stage="positions",
                partition_id=pid,
                input_fingerprint=gen_fp,
                output_files=out_files,
                metrics={
                    "chunk_rows": _parquet_rows(out_files, store.fs),
                    "wall_s": round(time.perf_counter() - t0, 3),
                },
                lineage={
                    "wave": wave,
                    "gen": next_gen,
                    "full": next_gen == 0 or set(dirty) == set(group_fp_now),
                    "th_bounds": bounds,
                    "group_fps": {p: group_fp_now[p] for p in dirty},
                    "covers_files": sorted(
                        fi for p in dirty for fi in group_file_idx[p]
                    ),
                },
            )
        )
        gc_stale_attempts(store, "positions", pid, {dirname})

    # ---- finalize: per-wave generation lists (live suffix) -----------------
    wave_gens: dict[int, list[dict]] = {}
    for rec in manifest.load_partitions().values():
        if rec.stage != "positions":
            continue
        wave_gens.setdefault(rec.lineage.get("wave", 0), []).append(
            {
                "gen": int(rec.lineage.get("gen", 0)),
                "full": bool(
                    rec.lineage.get("full") or rec.lineage.get("gen", 0) == 0
                ),
                "files": rec.output_files,
                "th_bounds": rec.lineage.get("th_bounds")
                or _th_bounds(rec.output_files, store.fs),
                "covers_files": rec.lineage.get("covers_files", []),
            }
        )
    for w in wave_gens:
        wave_gens[w].sort(key=lambda g: g["gen"])
        # generations older than the newest FULL one are fully superseded:
        # expose only the live suffix (stale dirs/records are GC'd by
        # compact_positions_index AFTER this manifest commits)
        base = max(
            (i for i, g in enumerate(wave_gens[w]) if g["full"]), default=0
        )
        wave_gens[w] = wave_gens[w][base:]
    return manifest.finalize(
        config=cfg.public_dict(),
        stats={"n_files": len(files)},
        extra={
            "kind": "positions",
            # flat lists kept for older readers; generation-aware readers
            # use pos_wave_gens + the supersede rule
            "pos_waves": {
                str(w): [f for g in gens for f in g["files"]]
                for w, gens in sorted(wave_gens.items())
            },
            "pos_th_bounds": {
                str(w): [b for g in gens for b in g["th_bounds"]]
                for w, gens in sorted(wave_gens.items())
            },
            "pos_wave_gens": {
                str(w): gens for w, gens in sorted(wave_gens.items())
            },
            "input_files": files,
        },
    )


def build_positions_from_index(
    index_dir: str | Path | Store,
    out_dir: str | Path | Store,
    cfg: PositionsConfig | None = None,
    *,
    filesystem=None,
    index_filesystem=None,
) -> dict:
    """Build the positional sidecar from a BM25 index's docs_tok checkpoint
    — the SHARED-tokenize-pass path.

    Requires the index to have been built with
    ``BuildConfig(emit_positions=True)`` (its docs checkpoint then carries
    the ``poss`` column).  The tokenizer configuration (pattern, tokenizer,
    stop words, doc builder) is taken from the INDEX manifest, never from
    the caller, so phrase/NEAR position arithmetic can't diverge from the
    paired BM25 index's query tokenization.  Extract + tokenize are skipped
    entirely: positions go straight to the sorted exchange + encode.
    """
    idx_store = Store.resolve(index_dir, index_filesystem)
    man = load_manifest(idx_store)
    docs_files = man.get("docs_files")
    if not docs_files:
        raise ValueError(f"no docs_files in manifest at {index_dir}")
    bc = man.get("config", {})
    if not bc.get("emit_positions"):
        raise ValueError(
            "index was not built with emit_positions=True — its docs "
            "checkpoint has no poss column (rebuild with "
            "BuildConfig(emit_positions=True) or use build_positions_index)"
        )
    base = cfg or PositionsConfig()
    cfg = dataclasses.replace(
        base,
        tokenized_source=True,
        pre_extracted=True,
        token_pattern=bc.get("token_pattern", base.token_pattern),
        tokenizer=bc.get("tokenizer", base.tokenizer),
        stop_words=bc.get("stop_words"),
        text_only=bc.get("text_only", bc.get("doc_builder") == "text"),
        salt_shift=bc.get("salt_shift", base.salt_shift),
    )
    return build_positions_index(
        docs_files,
        out_dir,
        cfg,
        filesystem=filesystem,
        source_filesystem=idx_store.fs,
    )


def compact_positions_index(
    source: str | Path | list | Store,
    out_dir: str | Path | Store,
    cfg: PositionsConfig | None = None,
    *,
    filesystem=None,
    source_filesystem=None,
) -> dict:
    """Merge a fragmented positional generation history back into one FULL
    generation per wave, crash-safely (the ``compact_index`` protocol):
    the compaction generation commits through the normal build path — the
    previously committed manifest stays valid until the pointer swap — and
    only AFTER the new manifest commits are the superseded generations'
    records and attempt directories deleted.  Tokenized-position
    checkpoints are reused, so tokenization is not repeated."""
    from .build import _record_dirs

    store = Store.resolve(out_dir, filesystem)
    if cfg is None:
        recorded = dict(load_manifest(store)["config"])
        cfg = PositionsConfig(**recorded)
    result = build_positions_index(
        source, store, cfg, compact=True, source_filesystem=source_filesystem
    )

    manifest = BuildManifest(store)
    by_wave: dict[int, list] = {}
    for rec in manifest.load_partitions().values():
        if rec.stage == "positions":
            by_wave.setdefault(rec.lineage.get("wave"), []).append(rec)
    removed = False
    for recs in by_wave.values():
        recs.sort(key=lambda r: r.lineage.get("gen", 0))
        base = 0
        for i, r in enumerate(recs):
            if r.lineage.get("full") or r.lineage.get("gen", 0) == 0:
                base = i
        for r in recs[:base]:
            # record first (a half-done GC never resurrects the gen)
            manifest.delete_partition(r.key())
            for d in _record_dirs(r):
                store.delete_dir_abs(d)
            removed = True
    if removed:
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


class PositionsIndex:
    """Query access to a committed positional sidecar."""

    def __init__(self, index_dir: str | Path | Store, *, filesystem=None):
        self._store = Store.resolve(index_dir, filesystem)
        self.manifest = load_manifest(self._store)
        if self.manifest.get("kind") != "positions":
            raise ValueError(f"{index_dir} is not a positions sidecar")
        cfg = self.manifest["config"]
        self.num_waves = int(cfg.get("num_waves", 1))
        from ..stages.berttok import make_tokenizer

        self._tokenize = make_tokenizer(
            cfg.get("tokenizer", "regex"),
            cfg.get("token_pattern"),
            stop_words=cfg.get("stop_words"),
        )
        self.salt_shift = int(cfg.get("salt_shift", DEFAULT_SALT_SHIFT))
        raw_gens = self.manifest.get("pos_wave_gens")
        if raw_gens is None:  # legacy single-generation sidecars
            raw_gens = {
                w: [
                    {
                        "gen": 0,
                        "files": fls,
                        "th_bounds": self.manifest.get("pos_th_bounds", {}).get(
                            w, []
                        ),
                        "covers_files": [],
                    }
                ]
                for w, fls in self.manifest["pos_waves"].items()
            }
        # per-wave ascending generations with the set of file indices a
        # LATER generation re-indexed (chunks from those are superseded)
        self._wave_gens: dict[int, list[dict]] = {}
        for w, gens in raw_gens.items():
            gens = sorted(gens, key=lambda g: g["gen"])
            out = []
            for i, g in enumerate(gens):
                if not g["files"]:
                    continue
                superseded: set[int] = set()
                for g2 in gens[i + 1 :]:
                    superseded.update(g2.get("covers_files", []))
                out.append(
                    {
                        "files": list(g["files"]),
                        "th_bounds": g.get("th_bounds", []),
                        "superseded": np.array(
                            sorted(superseded), dtype=np.uint64
                        ),
                    }
                )
            if out:
                self._wave_gens[int(w)] = out
        self._chunk_cache: dict[str, list[dict]] = {}

    def refresh(self) -> None:
        """Reload the committed manifest and generation layout in place."""
        self.__init__(self._store)

    def term_chunks(self, terms: list[str]) -> dict[str, list[dict]]:
        """Per-term encoded position chunks, surviving an online compaction:
        if a referenced file was GC'd after a newer manifest committed,
        reload once and retry (compaction is result-identical by contract —
        the same discipline as ``Searcher.term_chunks``)."""
        try:
            return self._term_chunks_once(terms)
        except FileNotFoundError:
            self.refresh()
            return self._term_chunks_once(terms)

    def _term_chunks_once(self, terms: list[str]) -> dict[str, list[dict]]:
        out: dict[str, list[dict]] = {t: [] for t in terms}
        missing = sorted({t for t in terms if t not in self._chunk_cache})
        for t in terms:
            if t in self._chunk_cache:
                out[t] = self._chunk_cache[t]
        if not missing:
            return out
        ths = hash_terms(np.asarray(missing, dtype=object))
        by_wave: dict[int, list[int]] = {}
        for i, th in enumerate(ths):
            by_wave.setdefault(
                int(th % np.uint64(self.num_waves)) if self.num_waves > 1 else 0, []
            ).append(i)
        found: dict[str, list[dict]] = {t: [] for t in missing}
        for w, idxs in by_wave.items():
            w_ths = ths[idxs]
            w_terms = [missing[i] for i in idxs]
            flt = pc.field("th").isin(pa.array(w_ths, type=pa.uint64())) & pc.field(
                "term"
            ).isin(w_terms)
            for gen in self._wave_gens.get(w, []):
                files = gen["files"]
                bounds = gen["th_bounds"]
                if bounds and len(bounds) == len(files):
                    files = [
                        f
                        for f, (lo, hi) in zip(files, bounds)
                        if ((w_ths >= np.uint64(lo)) & (w_ths <= np.uint64(hi))).any()
                    ]
                if not files:
                    continue
                tbl = pads.dataset(files, filesystem=self._store.fs).to_table(
                    filter=flt
                )
                if tbl.num_rows and gen["superseded"].size:
                    file_idx = pc.shift_right(
                        tbl.column("salt"),
                        pa.scalar(32 - self.salt_shift, pa.uint64()),
                    )
                    keep = np.isin(
                        file_idx.to_numpy(zero_copy_only=False),
                        gen["superseded"],
                        invert=True,
                    )
                    if not keep.all():
                        tbl = tbl.filter(pa.array(keep))
                tbl = tbl.sort_by([("term", "ascending"), ("salt", "ascending")])
                tbl = tbl.combine_chunks()
                if tbl.num_rows == 0:
                    continue
                cols = {
                    name: tbl.column(name).chunk(0) for name in tbl.column_names
                }
                t_terms = cols["term"].to_pylist()
                for i in range(tbl.num_rows):
                    found[t_terms[i]].append(
                        {
                            "salt": int(cols["salt"][i].as_py()),
                            "n_postings": int(cols["n_postings"][i].as_py()),
                            "doc_blob": memoryview(cols["doc_blob"][i].as_buffer()),
                            "cnt_blob": memoryview(cols["cnt_blob"][i].as_buffer()),
                            "pos_blob": memoryview(cols["pos_blob"][i].as_buffer()),
                        }
                    )
        for t in missing:
            self._chunk_cache[t] = found[t]
            out[t] = found[t]
        return out

    @staticmethod
    def _decoded(chunks: list[dict]) -> list[tuple]:
        """Each chunk decoded exactly once: [(docs, cnts, flat_pos)]."""
        return [
            decode_position_chunk(c)
            for c in sorted(chunks, key=lambda c: int(c.get("salt", 0)))
        ]

    def _term_keys(
        self, decoded: list[tuple], base: np.ndarray
    ) -> np.ndarray:
        """Sorted unique uint64 chain keys (base_idx * 2^32 + pos) for the
        (pre-decoded) postings of one term restricted to docIDs in ``base``."""
        if base.size == 0:
            return np.zeros(0, dtype=np.uint64)
        keys: list[np.ndarray] = []
        for docs, cnts, flat_pos in decoded:
            if docs.size == 0:
                continue
            idx = np.searchsorted(base, docs)
            idx[idx >= base.size] = base.size - 1
            keep = base[idx] == docs
            if not keep.any():
                continue
            rep = np.repeat(keep, cnts.astype(np.int64))
            flat_idx = np.repeat(idx.astype(np.uint64), cnts.astype(np.int64))
            keys.append(flat_idx[rep] * _POS_BASE + flat_pos[rep])
        if not keys:
            return np.zeros(0, dtype=np.uint64)
        out = np.concatenate(keys)
        out.sort()  # salt chunks are docID-disjoint; sort is near-free merge
        return out

    @staticmethod
    def _drop_deleted(tbl: pa.Table, deleted_doc_ids) -> pa.Table:
        """Filter tombstoned docs out of a per-doc result table.

        Per-doc values (occurrence counts, min distances) are independent
        across docs, so result-level filtering equals querying an index
        built without the deleted docs.  ``deleted_doc_ids`` is any uint64
        iterable — typically ``Searcher._tombstones()`` of the companion
        BM25 index (the sidecar shares its lineage docID space)."""
        if deleted_doc_ids is None or tbl.num_rows == 0:
            return tbl
        d = np.asarray(deleted_doc_ids, dtype=np.uint64)
        if d.size == 0:
            return tbl
        d = np.sort(d)
        ids = tbl.column("doc_id").to_numpy().astype(np.uint64)
        pos = np.searchsorted(d, ids)
        pos[pos >= d.size] = d.size - 1
        return tbl.filter(pa.array(d[pos] != ids))

    def phrase_occurrences(
        self, phrase: str, *, deleted_doc_ids=None
    ) -> pa.Table:
        """(doc_id, n_occ) for docs containing the exact token phrase."""
        terms = self._tokenize(phrase)  # NO dedup, NO cap: order is semantics
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.uint64()),
                "n_occ": pa.array([], type=pa.uint64()),
            }
        )
        if not terms:
            return empty
        chunks_by_term = self.term_chunks(list(dict.fromkeys(terms)))
        # candidate doc set = the rarest term's docIDs (phrase docs must
        # contain every term, so any term's doc set is a valid base);
        # every chunk is decoded exactly once and shared between the base
        # build and the chain-key construction
        df = {
            t: sum(c["n_postings"] for c in chunks_by_term[t])
            for t in set(terms)
        }
        if min(df.values()) == 0:
            return empty
        rarest = min(df, key=lambda t: (df[t], t))
        decoded = {t: self._decoded(chunks_by_term[t]) for t in set(terms)}
        base = np.sort(
            np.concatenate([d[0] for d in decoded[rarest]])
        )
        cur: np.ndarray | None = None
        term_keys: dict[str, np.ndarray] = {}
        for i, t in enumerate(terms):
            if t not in term_keys:
                term_keys[t] = self._term_keys(decoded[t], base)
            keys = term_keys[t]
            if keys.size == 0:
                return empty
            shifted = keys - np.uint64(i)  # occurrence-start key for step i
            if cur is None:
                cur = shifted
            else:
                cur = np.intersect1d(cur, shifted, assume_unique=True)
            if cur.size == 0:
                return empty
        occ_idx = (cur // _POS_BASE).astype(np.int64)
        counts = np.bincount(occ_idx, minlength=base.size)
        nz = np.flatnonzero(counts)
        out = pa.table(
            {
                "doc_id": pa.array(base[nz], type=pa.uint64()),
                "n_occ": pa.array(counts[nz].astype(np.uint64), type=pa.uint64()),
            }
        )
        return self._drop_deleted(out, deleted_doc_ids)

    def near_occurrences(
        self, term_a: str, term_b: str, window: int, *, deleted_doc_ids=None
    ) -> pa.Table:
        """(doc_id, min_dist) for docs where ``term_a`` and ``term_b`` occur
        within ``window`` tokens of each other (unordered proximity).

        ``min_dist`` = the smallest ``|pos_a - pos_b|`` in the doc (>= 1 —
        two distinct terms cannot share a position; for ``term_a ==
        term_b`` the distance is between two distinct occurrences).
        Vectorized: for every a-occurrence, the candidate nearest
        b-positions are the two ``searchsorted`` neighbours in the sorted
        b-key array; per-doc minima fall out of one ``np.minimum.at``.
        """
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.uint64()),
                "min_dist": pa.array([], type=pa.uint64()),
            }
        )
        if window < 0:
            return empty
        chunks = self.term_chunks(sorted({term_a, term_b}))
        df = {t: sum(c["n_postings"] for c in cl) for t, cl in chunks.items()}
        if not df or min(df.values()) == 0:
            return empty
        rarest = min(df, key=lambda t: (df[t], t))
        decoded = {t: self._decoded(cl) for t, cl in chunks.items()}
        base = np.sort(np.concatenate([d[0] for d in decoded[rarest]]))
        ka = self._term_keys(decoded[term_a], base)
        kb = self._term_keys(decoded[term_b], base)
        if term_a == term_b:
            # distance between consecutive occurrences of the same term
            if ka.size < 2:
                return empty
            same_doc = (ka[1:] // _POS_BASE) == (ka[:-1] // _POS_BASE)
            if not same_doc.any():
                return empty
            diffs = (ka[1:] - ka[:-1])[same_doc]
            idxs = (ka[1:] // _POS_BASE)[same_doc].astype(np.int64)
        else:
            if ka.size == 0 or kb.size == 0:
                return empty
            ins = np.searchsorted(kb, ka)
            cand_idx = np.concatenate(
                [np.clip(ins - 1, 0, kb.size - 1), np.clip(ins, 0, kb.size - 1)]
            )
            aa = np.concatenate([ka, ka])
            bb = kb[cand_idx]
            same_doc = (aa // _POS_BASE) == (bb // _POS_BASE)
            if not same_doc.any():
                return empty
            aa, bb = aa[same_doc], bb[same_doc]
            diffs = np.where(aa > bb, aa - bb, bb - aa)
            idxs = (aa // _POS_BASE).astype(np.int64)
        best = np.full(base.size, np.iinfo(np.uint64).max, dtype=np.uint64)
        np.minimum.at(best, idxs, diffs)
        hit = np.flatnonzero(best <= np.uint64(window))
        out = pa.table(
            {
                "doc_id": pa.array(base[hit], type=pa.uint64()),
                "min_dist": pa.array(best[hit], type=pa.uint64()),
            }
        )
        return self._drop_deleted(out, deleted_doc_ids)
