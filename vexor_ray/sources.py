"""Raw-file corpus ingestion: the reference's ``vexor index <dir>`` workflow.

The engine's native corpus format is a pages parquet ``(url, html|text)``;
this module closes the loop for users whose corpus is a DIRECTORY of real
files (txt/md/pdf/docx/pptx — reference ``collect_files``,
``vexor/services/index_service.py``):

- :func:`collect_files` — deterministic sorted walk with suffix allowlist
  and fnmatch exclude patterns (the gitignore-cascade analogue; SURVEY §2.1
  S2 generalization).
- :func:`read_directory` — files → ``(url, text)`` Dataset:
  ``ray.data.read_binary_files`` (bytes never touch the driver) → the
  extractor registry (``stages/extract.py``: from-scratch PDF/DOCX/PPTX
  extraction, byte-identical UTF-8 default for everything else).
- :func:`ingest_directory` — streaming sharded parquet write; the output is
  a ``pre_extracted`` pages corpus that :func:`vexor_ray.index.build.build_index`
  consumes directly (``pre_extracted=True``), so
  ``ingest → build → search`` is the reference's end-to-end pipeline.

Scale notes: the walk is driver-side metadata only (one entry per file);
payload bytes stream worker-side in small batches (wide binary column →
``batch_size`` kept low, text projected out immediately).
"""

from __future__ import annotations

import fnmatch
import os
from pathlib import Path

import pyarrow as pa
import ray.data

from .spec import FULL_CHAR_LIMIT

DEFAULT_SUFFIXES = (".txt", ".md", ".pdf", ".docx", ".pptx")


def collect_files(
    root: str | Path,
    *,
    suffixes: tuple[str, ...] = DEFAULT_SUFFIXES,
    exclude: tuple[str, ...] = (),
) -> list[str]:
    """Sorted relative paths under ``root`` matching the suffix allowlist.

    ``exclude`` patterns are fnmatch globs tested against the relative path
    (``'logs/*'``, ``'*.bak'``); sorting makes downstream lineage docIDs
    deterministic (same discipline as ``stages/docids.plan_fragments``).
    """
    root = Path(root)
    out: list[str] = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames.sort()
        for name in sorted(filenames):
            rel = os.path.relpath(os.path.join(dirpath, name), root)
            rel = rel.replace(os.sep, "/")
            if not any(rel.lower().endswith(s) for s in suffixes):
                continue
            if any(fnmatch.fnmatch(rel, pat) for pat in exclude):
                continue
            out.append(rel)
    return sorted(out)


def read_directory(
    root: str | Path,
    *,
    suffixes: tuple[str, ...] = DEFAULT_SUFFIXES,
    exclude: tuple[str, ...] = (),
    char_limit: int = FULL_CHAR_LIMIT,
    rich_extractors: bool = True,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Directory of raw files → ``(url, text)`` Dataset (extraction applied).

    ``url`` is the /-separated path relative to ``root``.  Files whose
    extraction yields nothing (undecodable, empty) are dropped, exactly as
    the parquet pipeline drops them (``stages/extract.py``).
    """
    from .stages.extract import make_extract_fn, register_default_extractors

    if rich_extractors:
        register_default_extractors()
    root = Path(root)
    rels = collect_files(root, suffixes=suffixes, exclude=exclude)
    if not rels:
        return ray.data.from_arrow(
            pa.table({"url": pa.array([], pa.string()),
                      "text": pa.array([], pa.large_string())})
        )
    paths = [str(root / r) for r in rels]
    raw = ray.data.read_binary_files(paths, include_paths=True)
    prefix = str(root).rstrip("/") + "/"

    def to_pages(batch: pa.Table) -> pa.Table:
        urls = [
            p[len(prefix):] if p.startswith(prefix) else p
            for p in batch.column("path").to_pylist()
        ]
        return pa.table(
            {"url": pa.array(urls, pa.string()), "html": batch.column("bytes")}
        )

    extract = make_extract_fn(char_limit)
    return raw.map_batches(
        to_pages, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    ).map_batches(
        extract, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )


def ingest_directory(
    root: str | Path,
    out_dir: str | Path,
    **kwargs,
) -> str:
    """Stream-extract a raw-file directory into a sharded pages parquet.

    The output directory is a ``pre_extracted`` corpus for
    ``build_index(..., pre_extracted=True)`` (and for ``chunk_pages``).
    Returns ``out_dir``.
    """
    out_dir = str(out_dir)
    read_directory(root, **kwargs).write_parquet(out_dir)
    return out_dir
