"""Mergeable cardinality sketch (HyperLogLog) over a token stream.

Upgrades SURVEY.md §2.5 A8 from "exact kept by design" to a real mergeable
sketch: per-batch register partials (a 256-row table each) merge by MAX —
associative, commutative, idempotent — so the reduce is a tiny fixed-size
exchange no matter the corpus size, the canonical sketch shape for 100 TB
(reference keeps exact COUNT/AVG in SQLite, `vexor/cache.py`; a distributed
engine needs the mergeable form).

Every step is exactly reproducible in ANSI SQL (DuckDB) from the
``md5_number_lower`` twin of :func:`vexor_ray.functions.dedup.md5_u64`:

- hash h = md5-lower-uint64(token)
- bucket = h >> 56 (m = 256 registers, p = 8)
- rho = (leading zeros of the low 56 bits) + 1 = 57 - bit_length(w)
- register[b] = max rho; estimate = alpha_256 * m^2 / sum(2^-register[b])

The harmonic sum is kept as an EXACT integer (sum of 2^(57-M[b]), fits in
a Python int / DuckDB HUGEINT) so the only float operations are one
conversion and one division — bit-identical between numpy and DuckDB.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data

from ..spec import TOKEN_RE
from .dedup import md5_u64

_P = 8
_M = 1 << _P  # 256 registers
_W_BITS = 64 - _P  # 56
_W_MASK = np.uint64((1 << _W_BITS) - 1)
# alpha_m * m^2 * 2^57 — identical literal expression in the SQL twin
_ALPHA_NUM = (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 144115188075855872.0


def _bitlen_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (no float log2 — values just
    below 2**k round UP when cast to float64 and off-by-one the result)."""
    bl = np.zeros(w.shape, dtype=np.int64)
    v = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        s = np.uint64(shift)
        big = v >= (np.uint64(1) << s)
        bl[big] += shift
        v[big] >>= s
    bl[w > np.uint64(0)] += 1
    return bl


def hll_partial_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → present-register partial (bucket, rho_max)."""
    regs = np.zeros(_M, dtype=np.int64)
    for t in batch.column("text").to_pylist():
        toks = set(TOKEN_RE.findall(t.lower())) if t else ()
        if not toks:
            continue
        hv = np.fromiter(
            (md5_u64(tok.encode()) for tok in toks), dtype=np.uint64, count=len(toks)
        )
        bucket = (hv >> np.uint64(_W_BITS)).astype(np.int64)
        rho = (_W_BITS + 1) - _bitlen_u64(hv & _W_MASK)
        np.maximum.at(regs, bucket, rho)
    present = np.nonzero(regs)[0]
    return pa.table(
        {
            "bucket": pa.array(present, type=pa.int64()),
            "rho_max": pa.array(regs[present], type=pa.int64()),
        }
    )


def merge_registers(partials: pa.Table) -> np.ndarray:
    """MAX-merge partial register tables into one dense register vector."""
    regs = np.zeros(_M, dtype=np.int64)
    if partials.num_rows:
        np.maximum.at(
            regs,
            partials.column("bucket").to_numpy(zero_copy_only=False),
            partials.column("rho_max").to_numpy(zero_copy_only=False),
        )
    return regs


def estimate_from_registers(regs: np.ndarray) -> tuple[int, int, int]:
    """(estimate, n_zero_registers, register_checksum) — all exact ints.

    The harmonic sum S = sum(2^(57 - M[b])) is an exact Python int; the
    raw estimate alpha*m^2/ (S/2^57) is one float division.  Small-range
    correction (linear counting) below 2.5*m, as in the HLL paper.
    """
    s = sum(1 << (_W_BITS + 1 - int(m)) for m in regs)
    v = int(np.count_nonzero(regs == 0))
    raw = _ALPHA_NUM / np.float64(s)
    if raw <= 2.5 * _M and v > 0:
        est = _M * math.log(_M / v)
    else:
        est = raw
    checksum = int(regs.sum()) * 1_000_003 + int((regs * np.arange(_M)).sum())
    return int(math.floor(est + 0.5)), v, checksum


def hll_distinct_tokens(docs: ray.data.Dataset) -> pa.Table:
    """Approximate distinct-token count over a documents corpus.

    Scale shape: the only data movement after the linear scan is one
    ≤256-row register table per batch — the merge is driver-side because
    the reduced state is ~2 KB regardless of corpus size.
    """
    partials = docs.map_batches(
        hll_partial_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    tbl = pa.concat_tables(
        [pa.Table.from_pandas(df, preserve_index=False) for df in
         partials.iter_batches(batch_format="pandas", batch_size=None)]
        or [pa.table({"bucket": pa.array([], pa.int64()),
                      "rho_max": pa.array([], pa.int64())})]
    )
    est, v, checksum = estimate_from_registers(merge_registers(tbl))
    return pa.table(
        {
            "n_distinct_est": pa.array([est], type=pa.int64()),
            "n_zero_registers": pa.array([v], type=pa.int64()),
            "register_checksum": pa.array([checksum], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Count-min sketch (heavy-hitter counts)

_CMS_D = 4  # hash rows
_CMS_W = 1024  # counters per row

# fixed probe list: estimated corpus counts for these tokens are the query
# output (high-frequency function words + a rare-tail control)
CMS_PROBES = ("the", "a", "of", "and", "to", "in", "is", "that", "for", "it")


def _cms_cell(token: str, row: int) -> int:
    """Row-j cell of a token: md5-lower-uint64('cms|j|' || token) mod W.

    String-domain key composition (like the LSH/SimHash twins) so DuckDB
    reproduces every cell with its own ``md5_number_lower``.
    """
    return md5_u64(f"cms|{row}|{token}".encode()) % _CMS_W


def cms_partial_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → per-batch partial counters (row, cell, cnt).

    Counters are ADDITIVE (order-independent), so partials merge by plain
    sum — the mergeable-sketch property that makes the reduce a fixed
    ≤ d*w rows per batch regardless of corpus size.
    """
    rows = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    from collections import Counter

    counts: Counter = Counter()
    for t in batch.column("text").to_pylist():
        counts.update(TOKEN_RE.findall(t.lower()) if t else ())
    for tok, c in counts.items():
        for j in range(_CMS_D):
            rows[j, _cms_cell(tok, j)] += c
    j_idx, cell_idx = np.nonzero(rows)
    return pa.table(
        {
            "row": pa.array(j_idx, type=pa.int64()),
            "cell": pa.array(cell_idx, type=pa.int64()),
            "cnt": pa.array(rows[j_idx, cell_idx], type=pa.int64()),
        }
    )


def cms_token_counts(
    docs: ray.data.Dataset, probes: tuple[str, ...] = CMS_PROBES
) -> pa.Table:
    """Count-min estimated corpus counts for the probe tokens.

    est(token) = min over rows j of counter[j][cell_j(token)] — an upper
    bound on the true count with the classic (eps, delta) guarantee.  The
    sketch is ~32 KB regardless of corpus size; the driver-side merge is
    the same tiny-reduced-state shape as the HLL sketch.
    """
    partials = docs.map_batches(
        cms_partial_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    rows = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    for df in partials.iter_batches(batch_format="pandas", batch_size=None):
        np.add.at(
            rows,
            (df["row"].to_numpy(), df["cell"].to_numpy()),
            df["cnt"].to_numpy(),
        )
    toks = sorted(probes)
    ests = [
        int(min(rows[j, _cms_cell(t, j)] for j in range(_CMS_D))) for t in toks
    ]
    return pa.table(
        {
            "token": pa.array(toks, type=pa.string()),
            "est_count": pa.array(ests, type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Sketched unigram-LM quality scoring (KenLM-shape with count-min counts)

LM_QUANT = 1 << 20  # log-probs quantized to 2^-20 dyadic grid (exact sums)


def cms_merged(docs: ray.data.Dataset) -> np.ndarray:
    """Merged (d, w) count-min counters over the corpus (driver-side; the
    reduced state is ~32 KB regardless of corpus size)."""
    partials = docs.map_batches(
        cms_partial_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    rows = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    for df in partials.iter_batches(batch_format="pandas", batch_size=None):
        np.add.at(
            rows,
            (df["row"].to_numpy(), df["cell"].to_numpy()),
            df["cnt"].to_numpy(),
        )
    return rows


def lm_quality(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-document average token log-probability under a sketched unigram
    LM — the perplexity-style quality signal (CCNet/KenLM shape) with
    count-min-estimated counts instead of a vocabulary table.

    Scale story: the "model" is the merged CMS (~32 KB) + the total token
    count, broadcast via ``ray.put`` — never a vocabulary-sized dict.  Two
    linear scans (count pass, score pass), no shuffle.  Per-token log-probs
    are quantized to the 2^-20 dyadic grid so per-doc sums are exact in any
    accumulation order — the SQL oracle reproduces ``avg_logp`` bit-for-bit
    (upper-bound CMS estimates make scores slightly optimistic for rare
    tokens; that bias is the standard sketch trade-off and identical on
    both sides).
    """
    import math

    import ray as _ray

    rows = cms_merged(docs)
    total = int(rows[0].sum())  # row 0 counts every occurrence exactly once
    rows_ref = _ray.put(rows)

    def score(batch: pa.Table) -> pa.Table:
        from collections import Counter

        cms = _ray.get(rows_ref)
        out_id, out_n, out_avg = [], [], []
        qcache: dict[str, float] = {}
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            counts = Counter(TOKEN_RE.findall(t.lower()) if t else ())
            n = sum(counts.values())
            if n == 0:
                continue
            s = 0.0
            for tok, c in counts.items():
                q = qcache.get(tok)
                if q is None:
                    est = min(cms[j, _cms_cell(tok, j)] for j in range(_CMS_D))
                    q = math.floor(math.log(est / total) * LM_QUANT + 0.5) / LM_QUANT
                    qcache[tok] = q
                s += c * q  # int * dyadic -> exact; order-independent
            out_id.append(d)
            out_n.append(n)
            out_avg.append(math.floor((s / n) * 1e6 + 0.5) / 1e6)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "n_tokens": pa.array(out_n, type=pa.int64()),
                "avg_logp": pa.array(out_avg, type=pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
