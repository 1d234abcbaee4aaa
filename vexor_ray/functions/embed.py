"""Deterministic text embeddings: char-n-gram feature hashing.

The classic hashing-vectorizer trick (Weinberger et al., ICML 2009 "Feature
Hashing for Large Scale Multitask Learning"): each character n-gram hashes
to one of ``dim`` signed buckets; the L2-normalized bucket histogram is the
embedding.  No model weights, fully deterministic, and cosine over these
vectors tracks lexical n-gram overlap — the same role the reference's
``DummyBackend`` deterministic embeddings play in its tests
(``tests/unit/test_search_service.py:15-30``), but meaningful enough to
grade hybrid retrieval (shared phrases → high cosine).

Shapes: a stateless vectorized ``map_batches`` stage (``hash_embed_batch``)
producing ``embedding:list<float32>``; the same kernel embeds queries
driver-side for broadcast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from .dedup import md5_u64

DEFAULT_EMBED_DIM = 256
_NGRAM = 3


def hash_embed(
    texts: list[str],
    dim: int = DEFAULT_EMBED_DIM,
    n: int = _NGRAM,
    as_float32: bool = True,
    mode: str = "char",
) -> np.ndarray:
    """(len(texts), dim) L2-normalized n-gram hash embeddings.

    ``mode="char"``: character n-grams (near-dup / fuzzy matching; can
    saturate on large natural-language corpora).  ``mode="word"``: word
    n-gram features over the spec tokenizer — much stronger retrieval
    signal (the eval harness measures the gap).  Bucket sums are integers
    (±1 per distinct gram) so the norm and every quotient are exactly
    reproducible in SQL double arithmetic — ``as_float32=False`` keeps the
    float64 form for oracle checking.
    """
    from ..spec import TOKEN_RE

    out = np.zeros((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        t = (t or "").lower()
        if mode == "word":
            toks = TOKEN_RE.findall(t)
            grams = {
                " ".join(toks[j : j + n])
                for j in range(max(len(toks) - n + 1, 0))
            }
            if not grams and toks:
                grams = {" ".join(toks)}
        elif len(t) < n:
            grams = {t} if t else set()
        else:
            grams = {t[j : j + n] for j in range(len(t) - n + 1)}
        if not grams:
            continue
        hs = np.fromiter(
            (md5_u64(g.encode()) for g in grams), dtype=np.uint64, count=len(grams)
        )
        buckets = (hs % np.uint64(dim)).astype(np.int64)
        signs = np.where((hs >> np.uint64(63)) & np.uint64(1), -1.0, 1.0)
        np.add.at(out[i], buckets, signs)
        norm = np.linalg.norm(out[i])
        if norm > 0:
            out[i] /= norm
    return out.astype(np.float32) if as_float32 else out


def hash_embed_batch(
    batch: pa.Table, *, dim: int = DEFAULT_EMBED_DIM, mode: str = "char", n: int = _NGRAM
) -> pa.Table:
    """(doc_id, text) → (doc_id, embedding:list<float32>)."""
    emb = hash_embed(batch.column("text").to_pylist(), dim, n=n, mode=mode)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "embedding": pa.array(emb.tolist(), type=pa.list_(pa.float32())),
        }
    )


def embed_documents(
    docs: ray.data.Dataset,
    *,
    dim: int = DEFAULT_EMBED_DIM,
    mode: str = "char",
    n: int = _NGRAM,
) -> ray.data.Dataset:
    return docs.map_batches(
        hash_embed_batch,
        fn_kwargs={"dim": dim, "mode": mode, "n": n},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
