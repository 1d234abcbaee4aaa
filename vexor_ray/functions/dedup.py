"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Shapes follow the standard scale patterns (see Ray Data guide):

- **exact**: vectorized content-hash per batch → ``groupby(hash)`` keep the
  smallest doc_id (one small shuffle of (hash, doc_id) pairs, never text);
- **minhash_lsh**: per-batch shingle→minhash signatures (vectorized numpy)
  → explode to (band, band_hash, doc_id) rows → ``groupby`` band buckets →
  candidate pairs → exact-Jaccard verification of candidates only;
- **simhash**: 64-bit simhash per doc; near-dup candidates = equal value of
  any of 4 16-bit sub-bands (Hamming ≤ 3 guarantee needs all bands; this is
  the standard block-split recall trade-off), verified by Hamming distance;
- **ngram_jaccard**: exact pairwise Jaccard over n-gram sets, applied to a
  *candidate* pair list (never all-pairs at scale).

All deterministic: fixed hash seeds, smallest-doc_id-wins.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..spec import TOKEN_RE

_MERSENNE = (1 << 61) - 1


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Hashes of word n-gram shingles (uint64), deduplicated."""
    toks = TOKEN_RE.findall((text or "").lower())
    if len(toks) < n:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    if not shingles:
        return np.zeros(0, dtype=np.uint64)
    hs = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
            for s in set(shingles)
        ),
        dtype=np.uint64,
    )
    return hs


def _minhash_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


class MinHasher:
    """Actor-pool stage: doc → minhash signature (num_perm x uint32)."""

    def __init__(self, num_perm: int = 64, shingle_n: int = 3, seed: int = 1):
        self.num_perm = num_perm
        self.shingle_n = shingle_n
        self.a, self.b = _minhash_params(num_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        hs = _shingle_hashes(text, self.shingle_n)
        if hs.size == 0:
            return np.full(self.num_perm, np.iinfo(np.uint32).max, dtype=np.uint32)
        # (a*h + b) mod p, then take min over shingles per permutation
        prods = (
            hs[:, None].astype(object) * self.a[None, :].astype(object)
            + self.b[None, :].astype(object)
        ) % _MERSENNE  # object dtype avoids uint64 overflow; rows are small
        sig = np.min(np.asarray(prods, dtype=np.uint64), axis=0)
        return (sig & np.uint64(0xFFFFFFFF)).astype(np.uint32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sigs = [self.signature(t) for t in texts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "sig": pa.array([s.tolist() for s in sigs], type=pa.list_(pa.uint32())),
            }
        )


def exact_duplicates(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Exact text dedup → rows (fp, n_dups, keep_doc_id), one per distinct text.

    ``keep_doc_id`` = smallest doc_id with that content (first-wins under the
    deterministic docID order).
    """
    from .textstats import fingerprint_batch

    fps = docs.map_batches(fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True)
    from ray.data.aggregate import Count, Min

    out = fps.groupby("fp").aggregate(
        Count(alias_name="n_dups"), Min("doc_id", alias_name="keep_doc_id")
    )
    return out


def minhash_lsh_pairs(
    docs: ray.data.Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    concurrency: int | tuple = (1, 4),
) -> pa.Table:
    """MinHash-LSH near-dup candidate pairs verified by exact Jaccard.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold.
    Pipeline: signatures (actor pool) → band explode → band-bucket groupby →
    per-bucket pairs → exact verify on the pair list.
    """
    rows_per_band = num_perm // bands
    sigs = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_n": shingle_n},
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
    )

    def explode_bands(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy()
        sig_arr = np.asarray(batch.column("sig").to_pylist(), dtype=np.uint32)
        if sig_arr.size == 0:
            return pa.table(
                {
                    "band": pa.array([], type=pa.int32()),
                    "band_hash": pa.array([], type=pa.uint64()),
                    "doc_id": pa.array([], type=pa.int64()),
                }
            )
        out_band, out_hash, out_doc = [], [], []
        fnv = np.uint64(1099511628211)
        for b in range(bands):
            rows = sig_arr[:, b * rows_per_band : (b + 1) * rows_per_band]
            hashes = np.zeros(doc_ids.size, dtype=np.uint64)
            with np.errstate(over="ignore"):
                for c in range(rows_per_band):
                    hashes = hashes * fnv + rows[:, c].astype(np.uint64)
            out_band.append(np.full(doc_ids.size, b, dtype=np.int32))
            out_hash.append(hashes)
            out_doc.append(doc_ids)
        return pa.table(
            {
                "band": pa.array(np.concatenate(out_band), type=pa.int32()),
                "band_hash": pa.array(np.concatenate(out_hash), type=pa.uint64()),
                "doc_id": pa.array(np.concatenate(out_doc), type=pa.int64()),
            }
        )

    bands_ds = sigs.map_batches(explode_bands, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(group["doc_id"].to_numpy())
        if ids.size < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        ia, ib = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    pairs = (
        bands_ds.groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty:
        return pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "jaccard": pa.array([], type=pa.float64()),
            }
        )
    pairs = pairs.drop_duplicates().astype(np.int64)

    # exact-Jaccard verification of the (small) candidate set: broadcast the
    # shingle sets of candidate docs only
    cand_set = set(pairs["doc_a"]) | set(pairs["doc_b"])
    cand_ids = sorted(cand_set)
    texts = {}
    for b in docs.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for d, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            if d in cand_set:
                texts[d] = t
    sh = {d: set(_shingle_hashes(texts.get(d, ""), shingle_n).tolist()) for d in cand_ids}
    out_a, out_b, out_j = [], [], []
    for a, b2 in pairs.itertuples(index=False):
        sa, sb = sh.get(a, set()), sh.get(b2, set())
        union = len(sa | sb)
        j = len(sa & sb) / union if union else 0.0
        if j >= threshold:
            out_a.append(a)
            out_b.append(b2)
            out_j.append(round(j, 6))
    return pa.table(
        {
            "doc_a": pa.array(out_a, type=pa.int64()),
            "doc_b": pa.array(out_b, type=pa.int64()),
            "jaccard": pa.array(out_j, type=pa.float64()),
        }
    )


class SimHasher:
    """Actor-pool stage: doc → 64-bit simhash over token features."""

    def __init__(self):
        import re

        self._re = re.compile(TOKEN_RE.pattern)

    @staticmethod
    def _simhash(tokens: list[str]) -> int:
        if not tokens:
            return 0
        hs = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
                )
                for t in tokens
            ),
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        )
        votes = bits.sum(axis=0) * 2 - len(tokens)  # +1 / -1 votes
        return int(
            np.sum((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64))
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out = [self._simhash(self._re.findall((t or "").lower())) for t in texts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(out, type=pa.uint64()),
            }
        )


def simhash_signatures(docs: ray.data.Dataset, concurrency: int | tuple = (1, 4)) -> ray.data.Dataset:
    return docs.map_batches(
        SimHasher, batch_format="pyarrow", concurrency=concurrency, zero_copy_batch=True
    )


def simhash_dup_pairs(
    docs: ray.data.Dataset, *, max_hamming: int = 3, concurrency: int | tuple = (1, 4)
) -> pa.Table:
    """Near-dup pairs by simhash: 16-bit band buckets → verify Hamming dist."""
    sigs = simhash_signatures(docs, concurrency)

    def explode(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy()
        sh = batch.column("simhash").to_numpy()
        parts = []
        for band in range(4):
            sub = (sh >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            parts.append(
                pa.table(
                    {
                        "band": pa.array(
                            np.full(doc_ids.size, band, dtype=np.int32)
                        ),
                        "key": pa.array(sub, type=pa.uint64()),
                        "doc_id": pa.array(doc_ids, type=pa.int64()),
                        "simhash": pa.array(sh, type=pa.uint64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    bands_ds = sigs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        if ids.size < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        ia, ib = np.triu_indices(ids.size, k=1)
        x = hs[ia] ^ hs[ib]
        ham = np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)
        keep = ham <= max_hamming
        return pd.DataFrame(
            {"doc_a": ids[ia][keep], "doc_b": ids[ib][keep], "hamming": ham[keep]}
        )

    pairs = (
        bands_ds.groupby(["band", "key"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty:
        return pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "hamming": pa.array([], type=pa.int64()),
            }
        )
    pairs = pairs.drop_duplicates(subset=["doc_a", "doc_b"]).sort_values(
        ["doc_a", "doc_b"]
    )
    return pa.Table.from_pandas(pairs.astype(np.int64), preserve_index=False)


def ngram_jaccard(
    texts_a: list[str], texts_b: list[str], n: int = 3
) -> list[float]:
    """Exact n-gram Jaccard for aligned candidate pairs (verification kernel)."""
    out = []
    for a, b in zip(texts_a, texts_b):
        sa = set(_shingle_hashes(a, n).tolist())
        sb = set(_shingle_hashes(b, n).tolist())
        union = len(sa | sb)
        out.append(len(sa & sb) / union if union else 0.0)
    return out
