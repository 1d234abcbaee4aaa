"""Anchor-text aggregation over the hash-derived link graph.

The defining web-search signal after PageRank: the text *other* pages use
when linking to a page often describes it better than its own body (the
classic "anchor text" field of web indexes).  This module aggregates, per
target page, the terms its in-links carry, and fuses that evidence into
BM25 ranking — the BM25F-style "anchor field boost".

Reference framing: the reference engine is single-corpus and has no link
graph; this is beyond-reference surface motivated by the webtext workload
(same rationale as ``functions/graph.py`` PageRank, whose deterministic
edge set this module reuses so the two signals describe ONE graph).

Determinism / twin contract:

- **Edges** are the PageRank edges: page ``i`` links to
  ``md5_u64(f"pr|{i}|{j}") % N`` for ``j < out_degree`` (SQL twin:
  ``md5_number_lower``).  On a real crawl this map stage is replaced by
  href extraction; everything downstream is unchanged.
- **Anchor term** of edge ``(i, j)``: the SOURCE document's token at
  position ``md5_u64(f"anchor|{i}|{j}") % n_tokens(i)`` — a deterministic
  stand-in for "the words around the href", drawn from the linking page
  exactly like real anchor text.  Sources with zero tokens contribute no
  anchor.  SQL twin: ``list_extract(toks, 1 + md5_number_lower(...) %
  len(toks))``.
- **Aggregation**: exact ``(dst, term) -> count`` via ONE coarse shuffle
  keyed on ``dst`` (``functions/groups.py`` discipline — partition count
  ~= cluster parallelism, pandas C-kernel group counts inside, never a
  corpus-cardinality Ray group key).
- **Fusion** (:func:`anchor_boosted_table`): ``fused = ROUND(bm25, 6) +
  weight * anchor_cnt`` with a dyadic ``weight`` (default 1/4) — integer
  count x dyadic weight is exact, and the single IEEE addition onto the
  shared 6dp-rounded BM25 double is identical in numpy and DuckDB, so the
  twin hashes bit-for-bit.

Scale shape: the anchor map emits ``out_degree`` rows per document (4N);
with a query-term filter pushed into the map stage (``terms=...``) the
emitted set shrinks to the documents whose sampled anchor hits the query —
the boosted query never shuffles the full 4N table.  Driver state in the
fusion is match-set-sized (the same streamed-membership pattern as
``pagerank_boosted_table``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..spec import TOKEN_RE
from .dedup import md5_u64
from .groups import coarse_grouped, int_pid


def _anchor_edges_fn(n_docs: int, out_degree: int, terms: frozenset[str] | None):
    """Batch fn: (doc_id, text) -> (dst, term) anchor-edge rows."""

    def edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_dst: list[int] = []
        out_term: list[str] = []
        for i, text in zip(ids, texts):
            toks = TOKEN_RE.findall(text.lower()) if text else []
            if not toks:
                continue
            n_tok = len(toks)
            for j in range(out_degree):
                term = toks[md5_u64(f"anchor|{i}|{j}".encode()) % n_tok]
                if terms is not None and term not in terms:
                    continue
                out_dst.append(md5_u64(f"pr|{i}|{j}".encode()) % n_docs)
                out_term.append(term)
        return pa.table(
            {
                "dst": pa.array(out_dst, type=pa.int64()),
                "term": pa.array(out_term, type=pa.string()),
            }
        )

    return edges


def _anchor_edges(
    sf_dir: str, out_degree: int, terms: frozenset[str] | None
) -> ray.data.Dataset:
    """(dst, term) anchor-edge rows, term filter pushed into the map."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n = docs.count()
    return docs.map_batches(
        _anchor_edges_fn(n, out_degree, terms),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def anchor_terms(
    sf_dir: str,
    out_degree: int = 4,
    n_parts: int = 64,
    terms: frozenset[str] | None = None,
) -> ray.data.Dataset:
    """Per-target anchor-term counts: Dataset (dst:int64, term:str,
    cnt:int64).

    ``terms``: optional filter applied INSIDE the map stage (only anchors
    in the set are emitted) — the pushdown the boosted query uses so the
    shuffle moves query-relevant rows only.
    """
    edges = _anchor_edges(sf_dir, out_degree, terms)

    def count_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["dst", "term"], as_index=False).size()
        return out.rename(columns={"size": "cnt"})

    return coarse_grouped(
        edges,
        lambda b: int_pid(b, ["dst"], n_parts),
        count_part,
        n_parts=n_parts,
    )


def anchor_counts_for_terms(
    sf_dir: str, terms: list[str], out_degree: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """(dst_sorted, cnt) — total in-link anchor hits per target for the
    given query terms; the small side the boosted query streams against.

    Rows reaching the driver are bounded by the number of DISTINCT targets
    whose sampled anchors hit a query term — query-result-sized, not
    corpus-sized (the term filter is pushed into the map stage)."""
    edges = _anchor_edges(sf_dir, out_degree, frozenset(terms))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("dst", as_index=False).size()
        return out.rename(columns={"size": "cnt"})

    per_dst = coarse_grouped(edges, lambda b: int_pid(b, ["dst"], 64), fold)
    frames = [
        b for b in per_dst.iter_batches(batch_size=65536, batch_format="pandas")
    ]
    if not frames:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    allp = pd.concat(frames, ignore_index=True)
    allp = allp.sort_values("dst", kind="mergesort")
    return (
        allp["dst"].to_numpy(dtype=np.int64),
        allp["cnt"].to_numpy(dtype=np.int64),
    )
