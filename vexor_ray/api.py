"""Convenience Python API: ephemeral in-memory-style indexes.

The analogue of the reference's ``index_in_memory`` / ``InMemoryIndex``
(``vexor/api.py:82-169, 216-493``): hand it a small corpus, get a queryable
index without managing directories.  The index lives in a private tempdir
(tmpfs-backed on typical hosts) and is deleted on ``close()`` / context
exit; the full engine (lineage docIDs, salted shuffle, compressed segments,
WAND) runs underneath, so results are identical to a persistent build.

Ray must already be initialised by the caller (library code never calls
``ray.init``).
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Sequence
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from .index.build import BuildConfig, build_index
from .query.searcher import Searcher


class InMemoryIndex:
    """Ephemeral index handle: search + stats, removed on close."""

    def __init__(self, index_dir: Path, root: Path):
        self._root = root
        self.searcher = Searcher(index_dir)

    @property
    def doc_count(self) -> int:
        return self.searcher.doc_count

    def search(self, query: str, k: int = 10, method: str = "auto"):
        """[(doc_id, score)] — docIDs are input positions (single shard)."""
        return self.searcher.search(query, k=k, method=method)

    def search_hits(self, queries: list[dict], method: str = "auto") -> pa.Table:
        return self.searcher.search_hits(queries, method=method)

    def df(self, term: str) -> int:
        return self.searcher.df(term)

    def close(self) -> None:
        if self._root is not None and self._root.exists():
            shutil.rmtree(self._root, ignore_errors=True)
        self._root = None

    def __enter__(self) -> "InMemoryIndex":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def index_in_memory(
    pages: Sequence[tuple[str, str]] | pa.Table,
    *,
    text_only: bool = False,
    tokenizer: str = "regex",
    config: BuildConfig | None = None,
) -> InMemoryIndex:
    """Build an ephemeral index from ``(url, text)`` pairs (pre-extracted).

    ``pages`` may also be a pyarrow Table with ``url`` and ``text`` columns.
    docIDs are input positions, so tie-breaks follow input order — the same
    contract as the persistent engine's lineage ids on a single shard.
    """
    if isinstance(pages, pa.Table):
        tbl = pa.table(
            {
                "url": pages.column("url").cast(pa.string()),
                "text": pages.column("text").cast(pa.large_string()),
            }
        )
    else:
        tbl = pa.table(
            {
                "url": pa.array([u for u, _ in pages], type=pa.string()),
                "text": pa.array([t for _, t in pages], type=pa.large_string()),
            }
        )
    root = Path(tempfile.mkdtemp(prefix="vexor_ray_mem_"))
    try:
        pq.write_table(tbl, root / "pages.parquet")
        cfg = config or BuildConfig(
            pre_extracted=True,
            text_only=text_only,
            tokenizer=tokenizer,
            num_waves=1,
            partitions_per_wave=2,
            shard_group_size=8,
            tokenize_concurrency=2,
        )
        if config is None:
            cfg.pre_extracted = True
        build_index([str(root / "pages.parquet")], root / "idx", cfg)
        return InMemoryIndex(root / "idx", root)
    except Exception:
        shutil.rmtree(root, ignore_errors=True)
        raise


def clear_index(index_dir: str | Path) -> bool:
    """Delete a persisted index directory — the analogue of the reference's
    ``clear_index`` (``vexor/api.py:693-718`` → ``_clear_index_with_settings``
    deleting the directory's cached index rows).

    Safety: refuses (returns False, deletes nothing) unless the directory
    actually looks like a vexor_ray index — a committed ``manifest.json``
    or an in-progress ``_manifest/`` checkpoint directory — so a mistyped
    path can never take out an unrelated tree.  Returns True if an index
    was removed.
    """
    d = Path(index_dir)
    if not d.is_dir():
        return False
    from .index.manifest import MANIFEST_NAME, POINTER_NAME

    if (
        not (d / MANIFEST_NAME).exists()
        and not (d / POINTER_NAME).exists()
        and not (d / "_manifest").is_dir()
    ):
        return False
    shutil.rmtree(d)
    return True
