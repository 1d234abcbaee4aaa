"""Data selection by hashed n-gram importance weights (DSIR).

Implements the scoring core of "Data Selection for Language Models via
Importance Resampling" (Xie et al. 2023, public): documents are scored by
how much more likely their hashed-bigram distribution is under a TARGET
corpus (e.g. the high-quality subset you want more of) than under the raw
SOURCE corpus.  Selecting/resampling by this score steers a 100 TB crawl
toward the target domain without training a classifier.

Scale story: both distributions are B-bucket (default 8192) integer count
vectors computed in ONE linear scan with per-batch partial vectors summed
on the driver (~64 KB per partial, never vocabulary-sized), then broadcast
back for the scoring scan.  Two scans total, no shuffle.  Per-bucket log
probabilities are quantized to the 2^-20 dyadic grid (NOTES.md pitfall 13)
so per-doc sums are exact in any accumulation order and the DuckDB oracle
reproduces ``dsir_score`` bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..spec import TOKEN_RE
from .dedup import md5_u64

DSIR_BUCKETS = 8192
_QUANT = float(1 << 20)


def _bigram_buckets(text: str, n_buckets: int) -> list[int]:
    toks = TOKEN_RE.findall(text.lower()) if text else []
    return [
        md5_u64(f"dsir|{a} {b}".encode()) % n_buckets
        for a, b in zip(toks, toks[1:])
    ]


def dsir_scores(
    docs: ray.data.Dataset,
    *,
    target_col: str = "lang",
    target_value: str = "en",
    n_buckets: int = DSIR_BUCKETS,
) -> ray.data.Dataset:
    """(doc_id, n_bigrams, dsir_score) — higher = more target-like.

    ``docs`` needs ``doc_id``, ``text`` and the target predicate column.
    score = mean over the document's bigram occurrences of
    ``qlog(p_target[bucket]) - qlog(p_source[bucket])`` with add-one
    smoothing and each log quantized separately (their difference is then
    exact dyadic arithmetic), rounded to 6 decimals.
    """

    def partial_counts(batch: pa.Table) -> pa.Table:
        src = np.zeros(n_buckets, dtype=np.int64)
        tgt = np.zeros(n_buckets, dtype=np.int64)
        texts = batch.column("text").to_pylist()
        is_tgt = [
            v == target_value for v in batch.column(target_col).to_pylist()
        ]
        for t, it in zip(texts, is_tgt):
            for b in _bigram_buckets(t, n_buckets):
                src[b] += 1
                if it:
                    tgt[b] += 1
        return pa.table(
            {
                "src": pa.array([src.tolist()], type=pa.list_(pa.int64())),
                "tgt": pa.array([tgt.tolist()], type=pa.list_(pa.int64())),
            }
        )

    src = np.zeros(n_buckets, dtype=np.int64)
    tgt = np.zeros(n_buckets, dtype=np.int64)
    parts = docs.map_batches(
        partial_counts, batch_format="pyarrow", zero_copy_batch=True
    )
    for rb in parts.iter_batches(batch_size=64, batch_format="pyarrow"):
        for col, acc in (("src", src), ("tgt", tgt)):
            c = rb.column(col)
            if len(c):
                acc += (
                    c.combine_chunks()
                    .flatten()
                    .to_numpy(zero_copy_only=False)
                    .reshape(-1, n_buckets)
                    .sum(axis=0)
                )

    s_total, t_total = int(src.sum()), int(tgt.sum())

    def qlog(cnt: np.ndarray, total: int) -> np.ndarray:
        # identical expression shape on the SQL side: ln((c+1)/(T+B))
        p = (cnt + 1.0) / float(total + n_buckets)
        return np.floor(np.log(p) * _QUANT + 0.5) / _QUANT

    weights = qlog(tgt, t_total) - qlog(src, s_total)  # dyadic - dyadic: exact
    w_ref = ray.put(weights)

    def score(batch: pa.Table) -> pa.Table:
        w = ray.get(w_ref)
        out_id, out_n, out_s = [], [], []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            bks = _bigram_buckets(t, n_buckets)
            if not bks:
                continue
            s = float(w[np.asarray(bks, dtype=np.int64)].sum())
            out_id.append(d)
            out_n.append(len(bks))
            out_s.append(math.floor(s / len(bks) * 1e6 + 0.5) / 1e6)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "n_bigrams": pa.array(out_n, type=pa.int64()),
                "dsir_score": pa.array(out_s, type=pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
