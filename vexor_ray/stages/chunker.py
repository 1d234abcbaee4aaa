"""Sliding-window page chunking — the reference's FullStrategy re-hosted.

Long pages are split into overlapping windows (size 1000 / overlap 100,
``content_extract_service.py:152-167``) and each chunk becomes its own
retrieval unit, exactly like the reference indexes chunk-granularity
documents.  The chunker MATERIALIZES a chunks corpus as parquet shards with
deterministic layout (one output file per input ROW GROUP, written by
parallel Ray tasks — a single huge input file fans out instead of
serializing through one task), so the standard index build runs over it
unchanged and chunk docIDs come from the same lineage scheme — composition
instead of a special id format.

Chunk urls are ``f"{url}#chunk{j:05d}"`` — unique, sorted within a page.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..refimpl.textnorm import chunk_text, extract_text
from ..spec import DEFAULT_CHUNK_OVERLAP, DEFAULT_CHUNK_SIZE, FULL_CHAR_LIMIT


@ray.remote
def _chunk_one_fragment(
    path: str,
    row_group: int | None,
    out_path: str,
    chunk_size: int,
    overlap: int,
    char_limit: int,
    pre_extracted: bool,
) -> int:
    """Chunk one parquet fragment (a row group, or the whole file when the
    file has a single group) — one huge input file fans out over its row
    groups instead of serializing through one task holding it all."""
    cols = ["url", "text"] if pre_extracted else ["url", "html"]
    pf = pq.ParquetFile(path)
    if row_group is None:
        tbl = pf.read(columns=cols)
    else:
        tbl = pf.read_row_group(row_group, columns=cols)
    urls_out: list[str] = []
    texts_out: list[str] = []
    payload = tbl.column("text" if pre_extracted else "html").to_pylist()
    for url, data in zip(tbl.column("url").to_pylist(), payload):
        text = data if pre_extracted else extract_text(data, char_limit)
        if text is None:
            continue
        for j, chunk in enumerate(chunk_text(text, chunk_size, overlap)):
            urls_out.append(f"{url}#chunk{j:05d}")
            texts_out.append(chunk)
    out = pa.table(
        {
            "url": pa.array(urls_out, type=pa.string()),
            "text": pa.array(texts_out, type=pa.string()),
        }
    )
    tmp = out_path + ".tmp"
    pq.write_table(out, tmp)
    import os

    os.replace(tmp, out_path)
    return out.num_rows


def chunk_pages(
    source: str | Path | list,
    out_dir: str | Path,
    *,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
    char_limit: int = FULL_CHAR_LIMIT,
    pre_extracted: bool = False,
) -> list[str]:
    """pages shards → chunk-corpus shards (returns the sorted file list)."""
    if isinstance(source, (str, Path)):
        p = Path(source)
        files = sorted(str(f) for f in p.glob("*.parquet")) if p.is_dir() else [str(p)]
    else:
        files = sorted(str(f) for f in source)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    futs = []
    for fi, f in enumerate(files):
        n_rg = pq.ParquetFile(f).metadata.num_row_groups
        if n_rg <= 1:
            out_path = str(out / f"chunks-{fi:05d}-0000.parquet")
            futs.append(
                _chunk_one_fragment.remote(
                    f, None, out_path, chunk_size, overlap, char_limit,
                    pre_extracted,
                )
            )
        else:
            for rg in range(n_rg):
                out_path = str(out / f"chunks-{fi:05d}-{rg:04d}.parquet")
                futs.append(
                    _chunk_one_fragment.remote(
                        f, rg, out_path, chunk_size, overlap, char_limit,
                        pre_extracted,
                    )
                )
    ray.get(futs)
    return sorted(str(f) for f in out.glob("chunks-*.parquet"))
