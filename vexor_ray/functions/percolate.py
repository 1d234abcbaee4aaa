"""Percolation: reverse search — stream documents against STORED queries.

The alerting/routing primitive of fulltext engines (Elasticsearch
``percolate``, reference-class feature for crawl pipelines: "which saved
alerts does this new page trigger?").  Semantics here: a document matches
a stored query iff EVERY query term occurs in the document (conjunctive
bag-of-words, the common default).

Ray-Data shape: the stored-query set is orders of magnitude smaller than
the corpus, so it is broadcast inside the task closure (compiled to
per-query frozensets once per task); the corpus streams through ONE
column-pruned ``map_batches`` scan emitting (doc_id, query_id) pairs — no
shuffle, no driver state beyond the result.  At 100 TB this is the same
shape as the engine's other single-scan operators; ten thousand stored
queries are a few hundred KB of closure.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..spec import TOKEN_RE


def percolate(
    docs: ray.data.Dataset,
    queries: list[tuple[int, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """(doc_id, query_id) pairs for every stored query a doc satisfies."""
    compiled = [
        (int(qid), frozenset(TOKEN_RE.findall(q.lower())))
        for qid, q in queries
    ]
    compiled = [(qid, ts) for qid, ts in compiled if ts]

    def match(batch: pa.Table) -> pa.Table:
        out_d, out_q = [], []
        for did, text in zip(
            batch.column(id_col).to_pylist(),
            batch.column(text_col).to_pylist(),
        ):
            toks = frozenset(TOKEN_RE.findall((text or "").lower()))
            for qid, ts in compiled:
                if ts <= toks:
                    out_d.append(int(did))
                    out_q.append(qid)
        return pa.table(
            {
                "doc_id": pa.array(out_d, type=pa.int64()),
                "query_id": pa.array(out_q, type=pa.int64()),
            }
        )

    return docs.map_batches(
        match, batch_format="pyarrow", zero_copy_batch=True
    )


def percolate_table(
    sf_dir: str, queries: list[tuple[int, str]]
) -> pa.Table:
    """Driver entry: percolate the documents table, totally ordered."""
    import numpy as np

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = percolate(docs, queries)
    tables = [
        t
        for t in (
            ray.get(r) for r in out.to_arrow_refs()
        )
        if t.num_rows
    ]
    if not tables:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "query_id": pa.array([], type=pa.int64()),
            }
        )
    tbl = pa.concat_tables(tables)
    d = tbl.column("doc_id").to_numpy()
    q = tbl.column("query_id").to_numpy()
    order = np.lexsort((q, d))
    return pa.table(
        {
            "doc_id": pa.array(d[order], type=pa.int64()),
            "query_id": pa.array(q[order], type=pa.int64()),
        }
    )


def percolate_sql(queries: list[tuple[int, str]]) -> str:
    """DuckDB twin: a doc matches a query iff its DISTINCT matched terms
    count equals the query's distinct term count (same conjunctive
    semantics; tokenization shared via the regex constant)."""
    rows = []
    for qid, q in queries:
        terms = sorted(set(TOKEN_RE.findall(q.lower())))
        for t in terms:
            rows.append(f"({int(qid)}, '{t}')")
    values = ", ".join(rows)
    return f"""
WITH toks AS (SELECT DISTINCT doc_id,
       unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
       FROM documents),
q(query_id, term) AS (VALUES {values}),
qn AS (SELECT query_id, COUNT(*) AS n FROM q GROUP BY query_id),
hit AS (SELECT t.doc_id, q.query_id, COUNT(*) AS c
        FROM toks t JOIN q USING (term) GROUP BY t.doc_id, q.query_id)
SELECT hit.doc_id, hit.query_id
FROM hit JOIN qn USING (query_id) WHERE hit.c = qn.n
ORDER BY doc_id, query_id"""
