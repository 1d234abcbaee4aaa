"""Bigram stupid-backoff language-model quality scoring (CCNet-style).

The standard LLM-training-data quality filter: score every document by its
average token log-probability under an n-gram LM trained on the corpus
itself (CCNet trains KenLM on Wikipedia; here the train corpus is the
scored corpus — swapping the train input is a parameter, not a redesign).
Upgrades the sketched unigram scorer (``sketch.py::lm_quality``) with
bigram context + stupid backoff (Brants et al. 2007: score(w2|w1) =
c(w1 w2)/c(w1) if seen, else 0.4 * c(w2)/total — no discounting, which is
what makes it trivially distributed AND exactly twin-able).

Determinism / twin contract (same discipline as ``lm_quality``):

- Counts are EXACT (map-side partial Counters -> one coarse shuffle per
  order), not sketched.
- Per-token log-probs are quantized to the 2^-20 dyadic grid
  (``floor(ln(p) * 2^20 + 0.5) / 2^20``), so per-doc sums are
  order-independent and SQL ``SUM`` reproduces them bit-for-bit.  Ratios
  are written with fixed association — ``c1 / c2`` one IEEE division,
  backoff ``0.4 * (c / total)`` — mirrored operand-for-operand in the
  DuckDB twin (ln parity on identical doubles is pinned by the PMI twin).
- ``avg_logp = floor((s / n) * 1e6 + 0.5) / 1e6`` — ROUND(x, 6) can never
  disagree (no double equals an odd multiple of 5e-7).

Scale shape: two coarse count shuffles (unigram, bigram) with map-side
combining; the model is PRUNED (``b_min`` drops hapax bigrams — the vast
majority under Zipf; the unigram table is vocabulary-sized, sublinear by
Heaps' law) and broadcast once via ``ray.put``; scoring is one linear
scan.  At 100 TB the pruned model is the same few-GB artifact CCNet
ships; if it outgrew the heap, prune unigrams to top-V (partial top-k
reduce) with an OOV floor, or flip the scoring join to a coarse hash
join on w1 — the count pipeline is unchanged either way.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..spec import TOKEN_RE
from .groups import coarse_grouped, str_pid
from .sketch import LM_QUANT

BACKOFF = 0.4  # stupid-backoff alpha (Brants et al. 2007)


def _unigram_counts(docs: ray.data.Dataset, n_parts: int = 64) -> ray.data.Dataset:
    """Exact (w, c) unigram counts: map-side partial Counter per batch,
    then one coarse shuffle keyed on the term."""

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter[str] = Counter()
        for t in batch.column("text").to_pylist():
            counts.update(TOKEN_RE.findall(t.lower()) if t else ())
        return pa.table(
            {
                "w": pa.array(list(counts.keys()), type=pa.string()),
                "c": pa.array(list(counts.values()), type=pa.int64()),
            }
        )

    parts = docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("w", as_index=False)["c"].sum()

    return coarse_grouped(parts, lambda b: str_pid(b, "w", n_parts), fold)


def _bigram_counts(
    docs: ray.data.Dataset, b_min: int = 2, n_parts: int = 64
) -> ray.data.Dataset:
    """Exact ("w1 w2", c) adjacent-bigram counts with c >= b_min.

    Tokens match ``[a-z0-9_]+`` so the space-joined key is unambiguous.
    The threshold is applied AFTER the exact global sum (a bigram can
    cross the threshold only with its full count)."""

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter[str] = Counter()
        for t in batch.column("text").to_pylist():
            toks = TOKEN_RE.findall(t.lower()) if t else []
            counts.update(
                f"{a} {b}" for a, b in zip(toks, toks[1:])
            )
        return pa.table(
            {
                "w": pa.array(list(counts.keys()), type=pa.string()),
                "c": pa.array(list(counts.values()), type=pa.int64()),
            }
        )

    parts = docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("w", as_index=False)["c"].sum()
        return out[out["c"] >= b_min]

    return coarse_grouped(parts, lambda b: str_pid(b, "w", n_parts), fold)


def lm_bigram_quality(
    docs: ray.data.Dataset, b_min: int = 2
) -> ray.data.Dataset:
    """Per-document average log-prob under the bigram stupid-backoff LM
    -> Dataset (doc_id:int64, n_tokens:int64, avg_logp:float64).

    Position 0 scores as a plain unigram ``c(w0)/total``; each transition
    scores ``c(w1 w2)/c(w1)`` when the (pruned) bigram survives, else
    ``0.4 * (c(w2)/total)``.  Every per-position value is dyadic-quantized
    before summing, so the sum is accumulation-order-independent and the
    per-transition-BAG evaluation below (count x value) is exact.
    """
    uc: dict[str, int] = {}
    for b in _unigram_counts(docs).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        uc.update(zip(b.column("w").to_pylist(), b.column("c").to_pylist()))
    total = sum(uc.values())
    bc: dict[str, int] = {}
    for b in _bigram_counts(docs, b_min=b_min).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        bc.update(zip(b.column("w").to_pylist(), b.column("c").to_pylist()))
    uc_ref, bc_ref = ray.put(uc), ray.put(bc)

    def score(batch: pa.Table) -> pa.Table:
        from collections import Counter

        u = ray.get(uc_ref)
        bg = ray.get(bc_ref)
        q_uni: dict[str, float] = {}   # quantized ln(c(w)/total)
        q_back: dict[str, float] = {}  # quantized ln(0.4 * (c(w)/total))
        q_big: dict[str, float] = {}   # quantized ln(c(w1w2)/c(w1))

        def quni(w: str) -> float:
            v = q_uni.get(w)
            if v is None:
                v = math.floor(math.log(u[w] / total) * LM_QUANT + 0.5) / LM_QUANT
                q_uni[w] = v
            return v

        def qtrans(pair: str, w1: str, w2: str) -> float:
            v = q_big.get(pair)
            if v is not None:
                return v
            cb = bg.get(pair)
            if cb is not None:
                v = math.floor(math.log(cb / u[w1]) * LM_QUANT + 0.5) / LM_QUANT
                q_big[pair] = v
                return v
            v = q_back.get(w2)
            if v is None:
                v = (
                    math.floor(
                        math.log(BACKOFF * (u[w2] / total)) * LM_QUANT + 0.5
                    )
                    / LM_QUANT
                )
                q_back[w2] = v
            return v

        out_id, out_n, out_avg = [], [], []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = TOKEN_RE.findall(t.lower()) if t else []
            n = len(toks)
            if n == 0:
                continue
            s = quni(toks[0])
            # transitions as a bag: sum of quantized values is order-free,
            # so count x value per distinct pair is exact
            trans = Counter(zip(toks, toks[1:]))
            for (w1, w2), cnt in trans.items():
                s += cnt * qtrans(f"{w1} {w2}", w1, w2)
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


def lm_bigram_quality_reference(
    tbl: pa.Table, b_min: int = 2
) -> list[tuple[int, int, float]]:
    """Single-process reference (same arithmetic, dense dicts) for tests."""
    from collections import Counter

    ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    toks_all = [TOKEN_RE.findall(t.lower()) if t else [] for t in texts]
    u: Counter[str] = Counter()
    bg: Counter[tuple[str, str]] = Counter()
    for toks in toks_all:
        u.update(toks)
        bg.update(zip(toks, toks[1:]))
    total = sum(u.values())
    bg = Counter({k: c for k, c in bg.items() if c >= b_min})
    out = []
    for d, toks in zip(ids, toks_all):
        n = len(toks)
        if n == 0:
            continue
        s = math.floor(math.log(u[toks[0]] / total) * LM_QUANT + 0.5) / LM_QUANT
        for w1, w2 in zip(toks, toks[1:]):
            cb = bg.get((w1, w2))
            if cb is not None:
                s += math.floor(math.log(cb / u[w1]) * LM_QUANT + 0.5) / LM_QUANT
            else:
                s += (
                    math.floor(
                        math.log(BACKOFF * (u[w2] / total)) * LM_QUANT + 0.5
                    )
                    / LM_QUANT
                )
        out.append((d, n, math.floor((s / n) * 1e6 + 0.5) / 1e6))
    return out
