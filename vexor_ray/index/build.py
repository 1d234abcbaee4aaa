"""Ray-Data-native inverted-index build (SPIMI-style, checkpointed).

Pipeline (SURVEY.md §3 "our lifecycle"):

``read_parquet(pages shards) → map_batches(extract) → map_batches(TokenizeDocs
actor pool) → [checkpoint: docs_tok per shard group] → sort(url) + prefix-sum
docIDs → [checkpoint: docs] → per term-hash wave: explode postings →
repartition(keys=(term, salt), sort) → vectorized run encoder →
[checkpoint: segments/wave-N] → finalize manifest``.

Scale design:

- the ONLY global sort is docID assignment (url rank); the posting shuffle is
  hash-partitioned by ``(term, salt)`` where ``salt = doc_id >> salt_shift``
  bounds any single key group to one doc-range regardless of Zipfian term
  skew (hot-term salting);
- stage 2's shuffle is split into ``num_waves`` independent term-hash waves,
  each committed separately → a killed build resumes at wave granularity and
  the peak shuffle footprint is 1/W of the postings;
- every stage writes to a temp dir and atomically renames, then commits a
  partition record (lineage + metrics) — see ``manifest.py``;
- tokenization runs exactly once per doc; corpus stats (doc_count,
  avg_doc_len) are exact global aggregates read from the docs checkpoint's
  columnar metadata, not a second pass over text.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
import shutil
import time
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..hashing import TERM_HASHER_ID, file_fingerprint, term_wave
from ..spec import (
    BM25_B,
    BM25_K1,
    DEFAULT_NUM_WAVES,
    DEFAULT_SALT_SHIFT,
    FULL_CHAR_LIMIT,
    POSTING_BLOCK_SIZE,
    TOKEN_PATTERN,
)
from ..stages.docids import assign_doc_ids
from ..stages.extract import make_extract_fn
from ..stages.tokenize import TokenizeDocs
from . import codec
from .manifest import BuildManifest, PartitionRecord


@dataclass
class BuildConfig:
    k1: float = BM25_K1
    b: float = BM25_B
    char_limit: int = FULL_CHAR_LIMIT
    pre_extracted: bool = False  # input already has a text column (no html)
    text_only: bool = False  # lexical doc = text alone (no url prefix)
    token_pattern: str = TOKEN_PATTERN
    block_size: int = POSTING_BLOCK_SIZE
    salt_shift: int = DEFAULT_SALT_SHIFT
    num_waves: int = DEFAULT_NUM_WAVES
    partitions_per_wave: int = 8
    shard_group_size: int = 8
    extract_batch_size: int = 256
    tokenize_batch_size: int = 1024
    tokenize_concurrency: int = 4
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
) -> pa.Table:
    """(doc_id, doc_len, terms, tfs) → flat (term, salt, doc_id, tf, dl) rows.

    Arrow list-flatten (zero per-row Python); optional term-hash wave filter.
    """
    batch = batch.combine_chunks()
    if batch.num_rows == 0:
        return pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "salt": pa.array([], type=pa.uint64()),
                "doc_id": pa.array([], type=pa.uint64()),
                "tf": pa.array([], type=pa.uint32()),
                "dl": pa.array([], type=pa.uint32()),
            }
        )
    terms_list = batch.column("terms")
    flat_terms = pc.list_flatten(terms_list)
    parent = pc.list_parent_indices(terms_list)
    doc_ids = pc.take(batch.column("doc_id"), parent)
    dls = pc.take(batch.column("doc_len"), parent)
    tfs = pc.list_flatten(batch.column("tfs"))

    out = pa.table(
        {
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
        terms_np = np.asarray(flat_terms.to_numpy(zero_copy_only=False), dtype=object)
        mask = term_wave(terms_np, num_waves) == np.uint64(wave)
        out = out.filter(pa.array(mask))
    return out


_CHUNK_SCHEMA = pa.schema(
    [
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


def encode_runs(
    batch: pa.Table,
    *,
    avg_doc_len: float,
    block_size: int,
    k1: float,
    b: float,
) -> pa.Table:
    """Encode complete (term, salt) runs of a hash-partitioned, key-sorted block.

    The input block comes from ``repartition(keys=["term", "salt"],
    sort=True)`` so rows of one key are adjacent; run boundaries are found
    vectorized and each run's postings are doc-sorted then delta+varint
    encoded with skip/block-max metadata (``codec.encode_chunk``).
    """
    batch = batch.combine_chunks()
    n = batch.num_rows
    if n == 0:
        return _CHUNK_SCHEMA.empty_table()
    terms = np.asarray(batch.column("term").to_numpy(zero_copy_only=False), dtype=object)
    salts = batch.column("salt").to_numpy()
    doc_ids = batch.column("doc_id").to_numpy()
    tfs = batch.column("tf").to_numpy()
    dls = batch.column("dl").to_numpy()

    change = (terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])
    starts = np.concatenate([[0], np.flatnonzero(change) + 1])
    ends = np.concatenate([starts[1:], [n]])

    cols: dict[str, list] = {name: [] for name in _CHUNK_SCHEMA.names}
    for s, e in zip(starts, ends):
        d = doc_ids[s:e]
        order = np.argsort(d, kind="stable")
        chunk = codec.encode_chunk(
            d[order],
            tfs[s:e][order],
            dls[s:e][order],
            avg_doc_len,
            block_size=block_size,
            k1=k1,
            b=b,
        )
        cols["term"].append(terms[s])
        cols["salt"].append(int(salts[s]))
        cols["n_postings"].append(chunk["n_postings"])
        cols["doc_blob"].append(chunk["doc_blob"])
        cols["tf_blob"].append(chunk["tf_blob"])
        cols["dl_blob"].append(chunk["dl_blob"])
        cols["doc_off"].append(chunk["doc_off"])
        cols["tf_off"].append(chunk["tf_off"])
        cols["dl_off"].append(chunk["dl_off"])
        cols["block_last"].append(chunk["block_last"])
        cols["block_ub"].append(chunk["block_ub"])
    return pa.table(
        {name: pa.array(cols[name], type=_CHUNK_SCHEMA.field(name).type)
         for name in _CHUNK_SCHEMA.names}
    )


# --------------------------------------------------------------------------
# build driver
# --------------------------------------------------------------------------


def _input_files(source: str | Path | list) -> list[str]:
    if isinstance(source, (str, Path)):
        p = Path(source)
        if p.is_dir():
            return sorted(str(f) for f in p.glob("*.parquet"))
        return [str(p)]
    return sorted(str(f) for f in source)


def _atomic_dir_write(ds: ray.data.Dataset, final_dir: Path) -> list[str]:
    tmp = final_dir.with_name(final_dir.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    if final_dir.exists():
        shutil.rmtree(final_dir)
    ds.write_parquet(str(tmp))
    os.replace(tmp, final_dir)
    return sorted(str(f) for f in final_dir.glob("*.parquet"))


def _parquet_rows(files: list[str]) -> int:
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def _column_sum(files: list[str], column: str) -> int:
    total = 0
    for f in files:
        total += pc.sum(pq.read_table(f, columns=[column]).column(column)).as_py() or 0
    return total


def build_index(
    source: str | Path | list,
    out_dir: str | Path,
    cfg: BuildConfig | None = None,
) -> dict:
    """Build (or resume) an index at ``out_dir`` from pages parquet shards.

    Returns the final manifest dict.  Safe to re-run: completed partitions
    are skipped via the checkpoint manifest.
    """
    cfg = cfg or BuildConfig()
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    manifest = BuildManifest(out, fail_after_partitions=cfg.fail_after_partitions)
    files = _input_files(source)
    if not files:
        raise ValueError(f"no parquet input files under {source}")

    # ---- stage 1: extract + tokenize, one partition per shard group -------
    groups = [
        files[i : i + cfg.shard_group_size]
        for i in range(0, len(files), cfg.shard_group_size)
    ]
    for gi, group in enumerate(groups):
        pid = f"group-{gi:05d}"
        fp = file_fingerprint(group)
        gdir = out / "docs_tok" / pid
        if manifest.is_done("docs_tok", pid, fp):
            continue
        t0 = time.perf_counter()
        read_cols = ["url", "text"] if cfg.pre_extracted else ["url", "html"]
        ds = ray.data.read_parquet(group, columns=read_cols)
        if not cfg.pre_extracted:
            ds = ds.map_batches(
                make_extract_fn(cfg.char_limit),
                batch_format="pyarrow",
                batch_size=cfg.extract_batch_size,
                zero_copy_batch=True,
            )
        ds = ds.map_batches(
            TokenizeDocs,
            fn_constructor_kwargs={
                "text_only": cfg.text_only,
                "token_pattern": cfg.token_pattern,
            },
            batch_format="pyarrow",
            batch_size=cfg.tokenize_batch_size,
            # autoscaling pool: min 1 actor so a small session (or a node
            # whose CPUs are largely reserved) can never deadlock the stage
            concurrency=(1, cfg.tokenize_concurrency),
            zero_copy_batch=True,
        )
        out_files = _atomic_dir_write(ds, gdir)
        rows_out = _parquet_rows(out_files)
        manifest.commit_partition(
            PartitionRecord(
                stage="docs_tok",
                partition_id=pid,
                input_fingerprint=fp,
                output_files=out_files,
                metrics={
                    "rows_in": _parquet_rows(group),
                    "rows_out": rows_out,
                    "tokens": _column_sum(out_files, "doc_len"),
                    "wall_s": round(time.perf_counter() - t0, 3),
                },
                lineage={"input_files": group, "config": cfg.public_dict()},
            )
        )

    # ---- stage 2: docID assignment (the one global sort) + corpus stats ----
    all_tok_files = sorted(
        str(f) for f in (out / "docs_tok").glob("group-*/*.parquet")
    )
    docs_fp = hashlib.sha1(
        (file_fingerprint(files) + cfg.token_pattern + str(cfg.text_only)).encode()
    ).hexdigest()
    docs_dir = out / "docs"
    if not manifest.is_done("docs", "global", docs_fp):
        t0 = time.perf_counter()
        ds = ray.data.read_parquet(all_tok_files)
        ds = assign_doc_ids(ds)
        docs_files = _atomic_dir_write(ds, docs_dir)
        doc_count = _parquet_rows(docs_files)
        total_len = _column_sum(docs_files, "doc_len")
        manifest.commit_partition(
            PartitionRecord(
                stage="docs",
                partition_id="global",
                input_fingerprint=docs_fp,
                output_files=docs_files,
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
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    prev_strategy = ctx.shuffle_strategy
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    try:
        for wave in range(cfg.num_waves):
            pid = f"wave-{wave:04d}"
            wave_fp = hashlib.sha1(
                f"{docs_fp}|{wave}|{cfg.num_waves}|{cfg.salt_shift}|"
                f"{cfg.block_size}|{cfg.k1}|{cfg.b}".encode()
            ).hexdigest()
            if manifest.is_done("segments", pid, wave_fp):
                continue
            if doc_count == 0:
                manifest.commit_partition(
                    PartitionRecord(
                        stage="segments",
                        partition_id=pid,
                        input_fingerprint=wave_fp,
                        metrics={"postings": 0, "chunk_rows": 0, "wall_s": 0.0},
                        lineage={"wave": wave, "config": cfg.public_dict()},
                    )
                )
                continue
            t0 = time.perf_counter()
            ds = ray.data.read_parquet(
                docs_files, columns=["doc_id", "doc_len", "terms", "tfs"]
            )
            ds = ds.map_batches(
                explode_postings,
                fn_kwargs={
                    "salt_shift": cfg.salt_shift,
                    "num_waves": cfg.num_waves,
                    "wave": wave if cfg.num_waves > 1 else None,
                },
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            ds = ds.repartition(
                cfg.partitions_per_wave, keys=["term", "salt"], sort=True
            )
            ds = ds.map_batches(
                encode_runs,
                fn_kwargs={
                    "avg_doc_len": avg_doc_len,
                    "block_size": cfg.block_size,
                    "k1": cfg.k1,
                    "b": cfg.b,
                },
                batch_format="pyarrow",
                batch_size=None,
                zero_copy_batch=True,
            )
            seg_files = _atomic_dir_write(ds, out / "segments" / pid)
            manifest.commit_partition(
                PartitionRecord(
                    stage="segments",
                    partition_id=pid,
                    input_fingerprint=wave_fp,
                    output_files=seg_files,
                    metrics={
                        "chunk_rows": _parquet_rows(seg_files),
                        "postings": _column_sum(seg_files, "n_postings"),
                        "bytes": sum(Path(f).stat().st_size for f in seg_files),
                        "wall_s": round(time.perf_counter() - t0, 3),
                    },
                    lineage={"wave": wave, "config": cfg.public_dict()},
                )
            )
    finally:
        ctx.shuffle_strategy = prev_strategy

    # ---- finalize ----------------------------------------------------------
    waves = {}
    for key, rec in manifest.load_partitions().items():
        if rec.stage == "segments":
            waves[int(rec.partition_id.split("-")[1])] = rec.output_files
    return manifest.finalize(
        config=cfg.public_dict(),
        stats={
            "doc_count": doc_count,
            "total_doc_len": total_len,
            "avg_doc_len": avg_doc_len,
        },
        extra={
            "input_files": files,
            "input_fingerprint": file_fingerprint(files),
            "docs_files": docs_files,
            "waves": {str(w): f for w, f in sorted(waves.items())},
        },
    )
