"""BM25 pipelines over the driver's ``documents`` table.

The ``documents`` corpus ``(doc_id:int64, text, lang, source, n_chars)`` is
indexed text-only (the lexical document is the text itself).  The engine's
internal docIDs are ranks of ``url = f"{doc_id:020d}"`` — numeric order —
and every result is mapped back to the ORIGINAL ``doc_id`` via the docs
table, so outputs are directly comparable to DuckDB oracles over the same
parquet.

Indexes are built once per (corpus fingerprint, config) under /tmp and
reused across calls (the build itself is checkpointed + resumable).
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..hashing import file_fingerprint
from ..index.build import BuildConfig, build_index
from ..index.manifest import MANIFEST_NAME
from ..query.searcher import Searcher

_CACHE_ROOT = Path("/tmp/vexor_ray_cache")


def documents_as_pages(sf_dir: str) -> ray.data.Dataset:
    """documents parquet → (url, text) dataset with url = zero-padded doc_id."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def to_pages(batch: pa.Table) -> pa.Table:
        urls = [f"{d:020d}" for d in batch.column("doc_id").to_pylist()]
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "text": pc.cast(batch.column("text"), pa.large_string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow", zero_copy_batch=True)


def documents_index(sf_dir: str) -> Path:
    """Build (or reuse) the BM25 index over ``{sf_dir}/documents.parquet``."""
    src = f"{sf_dir}/documents.parquet"
    fp = file_fingerprint([src])
    from ..spec import INDEX_FORMAT_VERSION
    key = hashlib.sha1(f"{fp}|v{INDEX_FORMAT_VERSION}".encode()).hexdigest()[:16]
    idx_dir = _CACHE_ROOT / f"docs_index_{key}"
    if not (idx_dir / MANIFEST_NAME).exists():
        tmp_pages = idx_dir.parent / (idx_dir.name + "_pages")
        tmp_pages.mkdir(parents=True, exist_ok=True)
        pages_file = tmp_pages / "pages.parquet"
        if not pages_file.exists():
            tbl = pa.concat_tables(
                [b for b in documents_as_pages(sf_dir).iter_batches(
                    batch_size=65536, batch_format="pyarrow")]
            )
            pq.write_table(tbl, pages_file)
        cfg = BuildConfig(
            pre_extracted=True,
            text_only=True,
            num_waves=1,
            partitions_per_wave=4,
            shard_group_size=8,
            tokenize_concurrency=2,
        )
        build_index([str(pages_file)], idx_dir, cfg)
    return idx_dir


class DocumentsSearcher:
    """Searcher over the documents corpus, reporting ORIGINAL doc_ids."""

    def __init__(self, sf_dir: str):
        self.index_dir = documents_index(sf_dir)
        self.searcher = Searcher(self.index_dir)
        # internal docID -> original documents.doc_id (url is the zero-padded
        # original id); small table, loaded once
        docs = pq.read_table(
            self.searcher.manifest["docs_files"], columns=["doc_id", "url"]
        )
        self._orig = dict(
            zip(
                docs.column("doc_id").to_pylist(),
                (int(u) for u in docs.column("url").to_pylist()),
            )
        )

    def scores(self, query: str) -> list[tuple[int, float]]:
        """All matching docs: [(original_doc_id, exact score)]."""
        results = self.searcher.search(query, k=self.searcher.doc_count)
        return [(self._orig[d], s) for d, s in results]

    def topk(self, query: str, k: int = 10, method: str = "exact") -> list[tuple[int, float]]:
        results = self.searcher.search(query, k=k, method=method)
        return [(self._orig[d], s) for d, s in results]


def bm25_scores_table(sf_dir: str, query: str) -> pa.Table:
    """(doc_id, score) for every doc matching the query — rounded to 6."""
    s = DocumentsSearcher(sf_dir)
    pairs = s.scores(query)
    pairs.sort(key=lambda p: p[0])
    return pa.table(
        {
            "doc_id": pa.array([p[0] for p in pairs], type=pa.int64()),
            "score": pa.array([round(p[1], 6) for p in pairs], type=pa.float64()),
        }
    )


def bm25_topk_table(sf_dir: str, query: str, k: int = 10) -> pa.Table:
    """Deterministic top-k by (rounded score desc, doc_id asc).

    Rounding before the cut keeps the boundary stable across engines whose
    float sums differ in the last bits (DuckDB SUM order is unspecified).
    """
    s = DocumentsSearcher(sf_dir)
    pairs = [(d, round(sc, 6)) for d, sc in s.scores(query)]
    pairs.sort(key=lambda p: (-p[1], p[0]))
    pairs = pairs[:k]
    return pa.table(
        {
            "doc_id": pa.array([p[0] for p in pairs], type=pa.int64()),
            "score": pa.array([p[1] for p in pairs], type=pa.float64()),
            "rank": pa.array(range(1, len(pairs) + 1), type=pa.int32()),
        }
    )


def doc_term_tf(sf_dir: str) -> ray.data.Dataset:
    """Tokenize-TF over documents: (doc_id, term, tf) rows."""
    from ..index.build import explode_postings
    from ..stages.tokenize import TokenizeDocs

    ds = documents_as_pages(sf_dir)
    ds = ds.map_batches(
        TokenizeDocs,
        fn_constructor_kwargs={"text_only": True},
        batch_format="pyarrow",
        concurrency=2,
        zero_copy_batch=True,
    )

    def to_rows(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        terms = batch.column("terms")
        flat = pc.list_flatten(terms)
        parent = pc.list_parent_indices(terms)
        urls = pc.take(batch.column("url"), parent)
        doc_ids = pa.array(
            [int(u) for u in urls.to_pylist()], type=pa.int64()
        )
        return pa.table(
            {
                "doc_id": doc_ids,
                "term": flat,
                "tf": pc.cast(pc.list_flatten(batch.column("tfs")), pa.int64()),
            }
        )

    return ds.map_batches(to_rows, batch_format="pyarrow", zero_copy_batch=True)


def doc_df(sf_dir: str) -> ray.data.Dataset:
    """Document frequency per term: (term, df)."""
    from ray.data.aggregate import Count

    return doc_term_tf(sf_dir).groupby("term").aggregate(Count(alias_name="df"))


def doc_stats(sf_dir: str) -> pa.Table:
    """Global corpus stats: (doc_count, avg_doc_len) — from the manifest."""
    s = DocumentsSearcher(sf_dir)
    return pa.table(
        {
            "doc_count": pa.array([s.searcher.doc_count], type=pa.int64()),
            "avg_doc_len": pa.array(
                [round(s.searcher.avg_doc_len, 6)], type=pa.float64()
            ),
        }
    )
