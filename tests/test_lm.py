"""Bigram stupid-backoff LM quality (vexor_ray/functions/lm.py).

The two-shuffle distributed counts + broadcast-model scoring must be
BIT-equal to the dense single-process reference (same dyadic-quantized
arithmetic), and the model must actually exercise both the bigram hit
path and the backoff path at test-corpus scale.
"""

from __future__ import annotations

from collections import Counter

import pyarrow.parquet as pq
import ray.data

from vexor_ray.functions.lm import (
    BACKOFF,
    lm_bigram_quality,
    lm_bigram_quality_reference,
)
from vexor_ray.spec import TOKEN_RE

SF = "/root/testdata/sf0.001"


def _docs():
    return ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )


def test_bigram_lm_bit_equal_to_dense_reference(ray_session):
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    want = lm_bigram_quality_reference(tbl)
    got = (
        lm_bigram_quality(_docs())
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(zip(got["doc_id"], got["n_tokens"], got["avg_logp"])) == want


def test_corpus_exercises_hit_and_backoff_paths():
    """The scoring is only meaningful if both CASE arms fire: the corpus
    must contain repeated bigrams (c >= 2 -> bigram path) AND transitions
    whose bigram was pruned (backoff path)."""
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    bg: Counter[tuple[str, str]] = Counter()
    for t in tbl.column("text").to_pylist():
        toks = TOKEN_RE.findall(t.lower()) if t else []
        bg.update(zip(toks, toks[1:]))
    n_kept = sum(1 for c in bg.values() if c >= 2)
    n_pruned = sum(1 for c in bg.values() if c < 2)
    # sf0.001's dense Zipf pool repeats most bigrams; a handful of hapax
    # bigrams still drive transitions through the backoff arm
    assert n_kept > 100 and n_pruned >= 5
    assert 0 < BACKOFF < 1


def test_zero_token_docs_are_skipped(ray_session):
    """CJK-only rows tokenize to nothing under the regex tokenizer and
    must be absent from the output (twin: WHERE len(l) > 0)."""
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    empty = {
        d
        for d, t in zip(
            tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
        )
        if not (TOKEN_RE.findall(t.lower()) if t else [])
    }
    got = lm_bigram_quality(_docs()).to_pandas()
    assert set(got["doc_id"]).isdisjoint(empty)
    assert len(got) == tbl.num_rows - len(empty)
    # scores are log-probs: strictly negative
    assert (got["avg_logp"] < 0).all()
