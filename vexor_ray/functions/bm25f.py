"""Field-weighted BM25F ranking over a two-field document split.

Fulltext engines rank multi-field documents (title/body, anchor/content)
with *per-field length normalization and weights* — BM25F (Zaragoza et
al., "Microsoft Cambridge at TREC-13", the simple-variant formulation):

    tf~(t,d)  = sum_f  w_f * tf(t,f,d) / B_f(d)
    B_f(d)    = (1 - b) + b * len_f(d) / avglen_f
    score(d)  = sum_t  idf(t) * tf~ / (k1 + tf~)

with the repo's BM25 constants (k1=1.5, b=0.75, non-negative Okapi idf —
``refimpl/bm25.py``, reference ``vexor/bm25.py:80-89``) and field weights
w_title=2, w_body=1.  The synthetic corpus has no separate title column,
so the field split is *deterministic*: the first ``HEAD_LEN`` tokens are
the title/lead field, the rest the body — both engines (Ray and the
DuckDB twin, :func:`bm25f_sql`) derive the identical split from the same
token stream, keeping the whole computation value-checkable.

Ray-Data shape (scale notes): TWO streamed column-pruned scans of the
corpus and ZERO shuffles —

1. pass 1 (``map_batches`` → per-block partial row): doc counts, per-field
   length sums, and per-query-term document frequencies; the driver folds
   #blocks partial rows (bounded by block count, not corpus size);
2. pass 2 (``map_batches`` → per-block top-k): broadcast the ≤32-term idf
   table in the task closure, score matching docs, keep k per block; the
   driver merges ≤ blocks×k rows.

Per-doc work is one compiled-regex ``findall`` + Counter over the match
terms — linear, embarrassingly parallel, no corpus-sized driver state.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..refimpl.bm25 import preprocess_query
from ..spec import BM25_B, BM25_K1, TOKEN_RE

HEAD_LEN = 8  # first HEAD_LEN tokens form the title/lead field
W_TITLE = 2.0  # dyadic field weights: w*tf is exact in IEEE
W_BODY = 1.0


def _field_counts(text: str, tset: frozenset) -> tuple[int, int, dict, dict]:
    """(len_title, len_body, tf_title, tf_body) for one document."""
    toks = TOKEN_RE.findall(text.lower())
    lt = min(len(toks), HEAD_LEN)
    tft = Counter(t for t in toks[:lt] if t in tset)
    tfb = Counter(t for t in toks[lt:] if t in tset)
    return lt, len(toks) - lt, tft, tfb


def bm25f_topk(
    sf_dir: str, query: str, k: int = 10, table: str = "documents"
) -> pa.Table:
    """Top-k ``(doc_id, score, rank)`` by BM25F over ``<table>.parquet``."""
    terms = preprocess_query(query)
    docs = ray.data.read_parquet(
        f"{sf_dir}/{table}.parquet", columns=["doc_id", "text"]
    )
    if not terms:
        return _empty()
    tset = frozenset(terms)
    t_idx = {t: i for i, t in enumerate(terms)}
    nt = len(terms)

    # ---- pass 1: per-block partials (counts, length sums, per-term df) ---
    def partials(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        tok_docs = 0
        sum_lt = 0
        sum_lb = 0
        df = np.zeros(nt, dtype=np.int64)
        for text in batch.column("text").to_pylist():
            lt, lb, tft, tfb = _field_counts(text or "", tset)
            if lt + lb:
                tok_docs += 1
                sum_lt += lt
                sum_lb += lb
            for t in set(tft) | set(tfb):
                df[t_idx[t]] += 1
        cols = {
            "n": pa.array([n], type=pa.int64()),
            "tok_docs": pa.array([tok_docs], type=pa.int64()),
            "sum_lt": pa.array([sum_lt], type=pa.int64()),
            "sum_lb": pa.array([sum_lb], type=pa.int64()),
        }
        for i in range(nt):
            cols[f"df_{i}"] = pa.array([int(df[i])], type=pa.int64())
        return pa.table(cols)

    part_refs = docs.map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    ).to_arrow_refs()
    parts = [t for t in (ray.get(r) for r in part_refs) if t.num_rows]
    if not parts:
        return _empty()
    agg = pa.concat_tables(parts)
    n_docs = int(pa.compute.sum(agg.column("n")).as_py() or 0)
    tok_docs = int(pa.compute.sum(agg.column("tok_docs")).as_py() or 0)
    sum_lt = int(pa.compute.sum(agg.column("sum_lt")).as_py() or 0)
    sum_lb = int(pa.compute.sum(agg.column("sum_lb")).as_py() or 0)
    df = np.array(
        [
            int(pa.compute.sum(agg.column(f"df_{i}")).as_py() or 0)
            for i in range(nt)
        ],
        dtype=np.int64,
    )
    if n_docs <= 0 or tok_docs <= 0:
        return _empty()
    # AVG(x) over the docs-with-tokens set — one double division, the same
    # operand order as the twin's AVG(lt)/AVG(lb)
    avgt = sum_lt / tok_docs
    avgb = sum_lb / tok_docs
    # idf: ln((n - df + 0.5)/(df + 0.5) + 1.0), terms with df=0 contribute 0
    idf = np.array(
        [
            math.log((n_docs - d + 0.5) / (d + 0.5) + 1.0) if d > 0 else 0.0
            for d in df
        ],
        dtype=np.float64,
    )

    # ---- pass 2: score + per-block top-k (idf table broadcast in closure) -
    def block_topk(batch: pa.Table) -> pa.Table:
        out_id, out_s = [], []
        ids = batch.column("doc_id").to_pylist()
        for did, text in zip(ids, batch.column("text").to_pylist()):
            lt, lb, tft, tfb = _field_counts(text or "", tset)
            if not tft and not tfb:
                continue
            # mirror of the twin's norm CTE, operand for operand
            bt = 1.0 - BM25_B + BM25_B * lt / avgt if avgt != 0 else 1.0
            bb = 1.0 - BM25_B + BM25_B * lb / avgb if avgb != 0 else 1.0
            s = 0.0
            # fixed query-term order: a deterministic float-sum order on
            # the Ray side (the twin's SUM order has matched the repo's
            # per-term accumulation at 6 decimals since round 1)
            for i, t in enumerate(terms):
                tt, tb = tft[t], tfb[t]
                if (tt == 0 and tb == 0) or df[i] <= 0:
                    continue
                tfw = W_TITLE * tt / bt + W_BODY * tb / bb
                s += idf[i] * tfw / (BM25_K1 + tfw)
            out_id.append(int(did))
            out_s.append(s)
        if not out_id:
            return _empty_scores()
        ids_np = np.asarray(out_id, dtype=np.int64)
        sc = np.round(np.asarray(out_s, dtype=np.float64), 6)
        order = np.lexsort((ids_np, -sc))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids_np[order], type=pa.int64()),
                "score": pa.array(sc[order], type=pa.float64()),
            }
        )

    refs = docs.map_batches(
        block_topk, batch_format="pyarrow", zero_copy_batch=True
    ).to_arrow_refs()
    tables = [t for t in (ray.get(r) for r in refs) if t.num_rows]
    if not tables:
        return _empty()
    tbl = pa.concat_tables(tables)
    ids_np = tbl.column("doc_id").to_numpy()
    sc = tbl.column("score").to_numpy()
    order = np.lexsort((ids_np, -sc))[:k]
    return pa.table(
        {
            "doc_id": pa.array(ids_np[order], type=pa.int64()),
            "score": pa.array(sc[order], type=pa.float64()),
            "rank": pa.array(
                np.arange(1, order.size + 1, dtype=np.int32), type=pa.int32()
            ),
        }
    )


def _empty_scores() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.float64()),
        }
    )


def _empty() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.float64()),
            "rank": pa.array([], type=pa.int32()),
        }
    )


def bm25f_sql(query_terms: list[str], k: int = 10) -> str:
    """DuckDB twin: the SAME field split (token ordinal ≤ HEAD_LEN), the
    same double expressions operand-for-operand (``2.0*tft/bt + 1.0*tfb/bb``,
    ``idf*tfw/(k1+tfw)``), 6-decimal round, (score desc, doc_id) order."""
    terms_values = ", ".join(f"('{t}')" for t in query_terms)
    toks = "regexp_extract_all(lower(text), '[a-z0-9_]+')"
    h, b, k1 = HEAD_LEN, BM25_B, BM25_K1
    wt, wb = W_TITLE, W_BODY
    return f"""
WITH tl AS (SELECT doc_id, {toks} AS ts FROM documents),
tok AS (SELECT doc_id, unnest(ts) AS term,
               unnest(range(1, len(ts) + 1)) AS ord FROM tl),
dl AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
l AS (SELECT doc_id, LEAST(n, {h}) AS lt, n - LEAST(n, {h}) AS lb FROM dl),
stats AS (SELECT (SELECT COUNT(*) FROM documents) AS n,
                 AVG(lt) AS avgt, AVG(lb) AS avgb FROM l),
qt(term) AS (VALUES {terms_values}),
tff AS (SELECT doc_id, term,
               COUNT(*) FILTER (WHERE ord <= {h}) AS tft,
               COUNT(*) FILTER (WHERE ord > {h}) AS tfb
        FROM tok WHERE term IN (SELECT term FROM qt) GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*) AS df FROM tff GROUP BY term),
norm AS (SELECT l.doc_id,
  CASE WHEN stats.avgt = 0 THEN 1.0
       ELSE 1.0 - {b} + {b} * l.lt / stats.avgt END AS bt,
  CASE WHEN stats.avgb = 0 THEN 1.0
       ELSE 1.0 - {b} + {b} * l.lb / stats.avgb END AS bb
  FROM l CROSS JOIN stats),
w AS (SELECT tff.doc_id, tff.term,
             {wt} * tff.tft / n.bt + {wb} * tff.tfb / n.bb AS tfw
      FROM tff JOIN norm n USING (doc_id)),
scores AS (SELECT w.doc_id,
  SUM( ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
       * w.tfw / ({k1} + w.tfw) ) AS s
  FROM w JOIN df USING (term) CROSS JOIN stats GROUP BY w.doc_id)
SELECT doc_id, ROUND(s, 6) AS score,
       CAST(row_number() OVER (ORDER BY ROUND(s, 6) DESC, doc_id)
            AS INT) AS rank
FROM scores ORDER BY ROUND(s, 6) DESC, doc_id LIMIT {k}"""
