"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Shapes follow the standard scale patterns (see Ray Data guide), with one
repo-specific rule everywhere: NO grouped operation ever hands Ray Data a
key whose cardinality grows with the corpus — Ray's ``groupby`` machinery
pays per-distinct-group Python (see ``functions/groups.py`` for the
measurements and the coarse-partition pattern all these pipelines use).

- **exact**: vectorized content-hash per batch → coarse-partitioned pandas
  groupby over (hash, doc_id) pairs, never text;
- **minhash_lsh**: per-batch shingle→minhash signatures (vectorized uint64
  numpy, no object dtype) → explode to (band, band_key, doc_id) rows →
  coarse-partitioned bucket-size count → collision buckets only (driver
  holds their keys, bounded by the pair count; over-cap degenerate buckets
  are dropped and logged, never O(bucket²)-exploded) → coarse-partitioned
  numpy pair-gen → exact-Jaccard verify via broadcast bytes map (small
  candidate side) or two coarse hash joins (large side / 100 TB path);
- **simhash**: 64-bit simhash per doc; near-dup candidates = equal value of
  any of 4 16-bit sub-bands (Hamming ≤ 3 guarantee needs all bands; this is
  the standard block-split recall trade-off), verified by vectorized Hamming
  distance (popcount via unpackbits, no per-pair Python);
- **ngram_jaccard**: exact pairwise Jaccard over n-gram sets, applied to a
  *candidate* pair list (never all-pairs at scale).

All hash primitives are md5-derived so every operator is exactly
reproducible in ANSI SQL (DuckDB ``md5_number_lower``) — the driver oracle
checks values, not just shapes.  Deterministic: fixed seeds,
smallest-doc_id-wins.
"""

from __future__ import annotations

import hashlib
import logging
import math
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..spec import TOKEN_RE
from ._pool import launch_stage as _launch_stage

logger = logging.getLogger(__name__)

_MERSENNE31 = (1 << 31) - 1
# buckets larger than this are dropped (logged) instead of pair-exploded:
# one degenerate band bucket is O(n^2) pairs and melts the stage at scale
DEFAULT_BUCKET_CAP = 256


def md5_u64(data: bytes) -> int:
    """uint64 from md5 digest bytes 8..16, little-endian — exactly DuckDB's
    ``md5_number_lower``, the SQL-side twin of every hash in this module."""
    return struct.unpack("<Q", hashlib.md5(data).digest()[8:])[0]


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Hashes of word n-gram shingles (uint64 < 2^32), deduplicated.

    32-bit range keeps ``a*h + b`` inside uint64/BIGINT for the MinHash
    permutations (no object-dtype math, no SQL HUGEINT).
    """
    toks = TOKEN_RE.findall((text or "").lower())
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    if len(toks) < n:
        shingles = {" ".join(toks)}
    else:
        shingles = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    return np.fromiter(
        (md5_u64(s.encode()) & 0xFFFFFFFF for s in shingles),
        dtype=np.uint64,
        count=len(shingles),
    )


def _minhash_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) per permutation for ``(a*h + b) mod (2^31-1)`` — 32-bit inputs
    in uint64, one matrix op per doc; the same constants are inlined into the
    DuckDB oracle."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE31, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE31, size=num_perm, dtype=np.uint64)
    return a, b


class MinHasher:
    """Actor-pool stage: doc → minhash signature (num_perm x uint32).

    Docs with no shingles (no tokens) emit NO signature row: an empty doc
    cannot be a near-dup, and keeping them out of banding avoids the
    degenerate all-empties bucket.
    """

    def __init__(self, num_perm: int = 64, shingle_n: int = 3, seed: int = 1):
        self.num_perm = num_perm
        self.shingle_n = shingle_n
        self.a, self.b = _minhash_params(num_perm, seed)

    def signature(self, text: str) -> np.ndarray | None:
        hs = _shingle_hashes(text, self.shingle_n)
        if hs.size == 0:
            return None
        # (a*h + b) mod p in pure uint64: a < 2^31, h < 2^32 → a*h < 2^63
        prods = (hs[:, None] * self.a[None, :] + self.b[None, :]) % np.uint64(
            _MERSENNE31
        )
        return np.min(prods, axis=0).astype(np.uint32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        out_ids, out_sigs = [], []
        for d, t in zip(ids, texts):
            sig = self.signature(t)
            if sig is not None:
                out_ids.append(d)
                out_sigs.append(sig.tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "sig": pa.array(out_sigs, type=pa.list_(pa.uint32())),
            }
        )


def exact_duplicates(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Exact text dedup → rows (fp, n_dups, keep_doc_id), one per distinct text.

    ``keep_doc_id`` = smallest doc_id with that content (first-wins under the
    deterministic docID order).
    """
    from .groups import coarse_grouped, str_pid
    from .textstats import fingerprint_batch

    fps = docs.map_batches(fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True)

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        # fp cardinality ~ corpus size: pandas C-kernel groupby inside coarse
        # hash partitions (see functions/groups.py), never per-fp Python
        return df.groupby("fp", as_index=False).agg(
            n_dups=pd.NamedAgg(column="doc_id", aggfunc="count"),
            keep_doc_id=pd.NamedAgg(column="doc_id", aggfunc="min"),
        )

    return coarse_grouped(fps, lambda b: str_pid(b, "fp", 64), agg)


_PAIR_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])


def _jaccard_bytes(sa: bytes, sb: bytes) -> float:
    """Exact Jaccard of two shingle sets stored as raw uint64 bytes."""
    va = np.frombuffer(sa, dtype=np.uint64)
    vb = np.frombuffer(sb, dtype=np.uint64)
    inter = np.intersect1d(va, vb, assume_unique=True).size
    union = va.size + vb.size - inter
    return inter / union if union else 0.0


def _bucket_spans(bid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) of equal-``bid`` runs in a bid-sorted array."""
    starts = np.flatnonzero(np.r_[True, bid[1:] != bid[:-1]])
    ends = np.r_[starts[1:], bid.size]
    return starts, ends


def _multi_bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """All within-bucket (doc_a < doc_b) pairs for every bucket in one
    coarse partition — one numpy pass, no per-bucket pandas calls (the
    per-group overhead of a bucket-keyed ``map_groups`` scales with bucket
    count; this scales with the partition count P)."""
    bid = group["bid"].to_numpy()
    ids = group["doc_id"].to_numpy()
    order = np.lexsort((ids, bid))
    bid, ids = bid[order], ids[order]
    out_a, out_b = [], []
    for s, e in zip(*_bucket_spans(bid)):
        if e - s < 2:
            continue
        ia, ib = np.triu_indices(e - s, k=1)
        seg = ids[s:e]
        out_a.append(seg[ia])
        out_b.append(seg[ib])
    if not out_a:
        return pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
            }
        )
    return pd.DataFrame(
        {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
    )


def attach_binary_column(
    pairs_ds: ray.data.Dataset,
    payload_ds: ray.data.Dataset,
    side: str,
    carry: list[str],
    *,
    out_col: str,
    payload_key: str = "doc_id",
    payload_col: str = "shingles",
    binary_carry: tuple[str, ...] = (),
    n_parts: int = 64,
) -> ray.data.Dataset:
    """Shuffle-join a binary payload column onto one int-key side of a pair
    Dataset — the 100 TB verify path shared by MinHash-Jaccard and
    embedding-cosine dedup.

    ``payload_ds`` has rows ``(payload_key:int64, payload_col:binary)``;
    each pair row gains ``out_col`` = the payload of its ``side`` key via a
    tagged union + ONE coarse-partitioned hash join (``functions/groups.py``)
    — nothing pair- or payload-sized ever lands on the driver.

    ``carry``: pair columns to keep; ``binary_carry`` names the carries that
    are binary (e.g. the first join's output on the second join) so the
    union schemas line up.  Int columns are re-cast after the pandas merge
    (nullable int64 → float64 is pandas' doing, not a value change).
    """
    from .groups import coarse_grouped, int_pid

    def pair_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {
            "key": batch.column(side),
            "kind": pa.array(np.ones(n, dtype=np.int8)),
            "payload": pa.nulls(n, type=pa.binary()),
        }
        for c in carry:
            cols[c] = batch.column(c)
        return pa.table(cols)

    def payload_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {
            "key": batch.column(payload_key),
            "kind": pa.array(np.zeros(n, dtype=np.int8)),
            "payload": batch.column(payload_col),
        }
        for c in carry:
            typ = pa.binary() if c in binary_carry else pa.int64()
            cols[c] = pa.nulls(n, type=typ)
        return pa.table(cols)

    int_carry = [c for c in carry if c not in binary_carry]

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.astype({"key": "int64"})
        pay = df.loc[df["kind"] == 0, ["key", "payload"]]
        pr = df.loc[df["kind"] == 1, ["key", *carry]]
        m = pr.merge(pay, on="key", how="left")
        out = m[[*carry, "payload"]].rename(columns={"payload": out_col})
        return out.astype({c: "int64" for c in int_carry})

    tagged = pairs_ds.map_batches(
        pair_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        payload_ds.map_batches(
            payload_rows, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    return coarse_grouped(tagged, lambda b: int_pid(b, ["key"], n_parts), merge)


def minhash_lsh_pairs(
    docs: ray.data.Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    seed: int = 1,
    bucket_cap: int = DEFAULT_BUCKET_CAP,
    concurrency: int | tuple | None = None,
    broadcast_cands_threshold: int = 1_000_000,
) -> ray.data.Dataset:
    """MinHash-LSH near-dup candidate pairs verified by exact Jaccard.

    Returns a Dataset of (doc_a, doc_b, jaccard) with doc_a < doc_b and
    jaccard >= threshold.  Pipeline: signatures → band explode →
    coarse-partitioned bucket-size count (collision buckets only; singleton
    buckets never touch per-group Python) → semi-join band rows to
    collision buckets → coarse-partitioned numpy pair-gen → candidate-pair
    Dataset → exact-Jaccard verification.

    Verification picks a join strategy by candidate count (classic
    broadcast-vs-shuffle join split), with the count computed DISTRIBUTED
    (doc_a ∪ doc_b → coarse-partitioned distinct) before anything is
    collected: ``<= broadcast_cands_threshold`` candidates ship as one
    compact ``{doc_id: shingle_bytes}`` broadcast and verify is a single
    map over the pair Dataset; above it (the 100 TB path; force with
    ``broadcast_cands_threshold=0``) shingles are computed for every doc
    in one streamed scan and stay a Dataset, attached to each pair side
    via two coarse-partitioned hash joins.  Driver-side state is bounded
    by the broadcast threshold on the first arm and is ZERO on the second
    — never corpus-sized.
    """
    rows_per_band = num_perm // bands
    sigs = _launch_stage(
        docs,
        MinHasher,
        {"num_perm": num_perm, "shingle_n": shingle_n, "seed": seed},
        concurrency=concurrency,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # Band keys are the band's signature values packed into ``n_words``
    # uint64 columns (zero-padded to an even uint32 count) — an INJECTIVE
    # encoding, so bucket equality classes are exactly row equality, same
    # as the SQL twin's string_agg key; but the engine side never
    # materializes a Python object per row (the '-'-joined string key cost
    # 16 Python strings per doc per pass).
    n_words = (rows_per_band + 1) // 2
    key_cols = [f"k{i}" for i in range(n_words)]
    _pad = n_words * 2 - rows_per_band

    def _empty_bands() -> pa.Table:
        cols: dict = {"band": pa.array([], type=pa.int32())}
        for c in key_cols:
            cols[c] = pa.array([], type=pa.int64())
        cols["doc_id"] = pa.array([], type=pa.int64())
        return pa.table(cols)

    def explode_bands(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy()
        n = doc_ids.size
        if n == 0:
            return _empty_bands()
        col = batch.column("sig")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # Arrow-native flatten: list offsets honored, uint32 values buffer
        # reshaped — no to_pylist round-trip (NOTES.md pitfall 14)
        sig_arr = col.flatten().to_numpy(zero_copy_only=False).reshape(n, num_perm)
        out_band, out_doc = [], []
        out_words: list[list[np.ndarray]] = [[] for _ in range(n_words)]
        for b in range(bands):
            rows = sig_arr[:, b * rows_per_band : (b + 1) * rows_per_band]
            if _pad:
                rows = np.concatenate(
                    [rows, np.zeros((n, _pad), dtype=np.uint32)], axis=1
                )
            words = np.ascontiguousarray(rows).view(np.int64)  # (n, n_words)
            out_band.append(np.full(n, b, dtype=np.int32))
            for i in range(n_words):
                out_words[i].append(words[:, i].copy())
            out_doc.append(doc_ids)
        cols = {"band": pa.array(np.concatenate(out_band), type=pa.int32())}
        for i, c in enumerate(key_cols):
            cols[c] = pa.array(np.concatenate(out_words[i]), type=pa.int64())
        cols["doc_id"] = pa.array(np.concatenate(out_doc), type=pa.int64())
        return pa.table(cols)

    sigs = sigs.materialize()  # feeds two passes; 1 row/doc (64 x uint32)
    bands_ds = sigs.map_batches(explode_bands, batch_format="pyarrow", zero_copy_batch=True)

    # Pass 1 — bucket-size count in coarse hash partitions (bucket
    # cardinality ~ bands × docs, so neither a bucket-keyed map_groups nor
    # a native Aggregate may ever see the real key; see functions/groups.py)
    from .groups import coarse_grouped, int_pid

    group_cols = ["band", *key_cols]

    def count_buckets(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(group_cols, as_index=False).size()
        return out.rename(columns={"size": "n"})

    counts = coarse_grouped(
        bands_ds, lambda b: int_pid(b, group_cols, 64), count_buckets
    )

    def only_multi(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(batch.column("n"), pa.scalar(2)))

    multi = counts.map_batches(
        only_multi, batch_format="pyarrow", zero_copy_batch=True
    )

    # collision-bucket key → integer bucket id: driver-bounded by the
    # candidate-pair count (every kept bucket yields >= 1 pair); a bucket
    # of n > cap docs splits into ceil(n/cap) sub-buckets by doc_id % m —
    # per-bucket work stays O(cap²), recall degrades ~1/m (never to zero),
    # and the rule is SQL-trivial so the value oracle models it exactly
    bt_cols: dict[str, list] = {c: [] for c in group_cols}
    starts: list[int] = []
    ms: list[int] = []
    n_buckets = 0
    for b in multi.iter_batches(batch_size=8192, batch_format="pyarrow"):
        kvals = [b[c].to_pylist() for c in group_cols]
        for row in zip(*kvals, b["n"].to_pylist()):
            n = row[-1]
            m = -(-int(n) // bucket_cap)
            if m > 1:
                logger.warning(
                    "minhash-lsh: splitting band bucket of %d docs into %d "
                    "sub-buckets (cap %d; recall ~1/%d inside it, other "
                    "bands unaffected)",
                    n,
                    m,
                    bucket_cap,
                    m,
                )
            for c, v in zip(group_cols, row):
                bt_cols[c].append(v)
            starts.append(n_buckets)
            ms.append(m)
            n_buckets += m
    if n_buckets:
        bucket_table = pd.DataFrame(
            {
                "band": pd.Series(bt_cols["band"], dtype="int32"),
                **{
                    c: pd.Series(bt_cols[c], dtype="int64")
                    for c in key_cols
                },
                "bid": pd.Series(starts, dtype="int64"),
                "m": pd.Series(ms, dtype="int64"),
            }
        )
        keys_ref = ray.put(bucket_table)
        # Pass 2 — semi-join band rows to collision buckets, coarse-partition
        # buckets by bid % P, and generate pairs for MANY buckets per group
        # call in pure numpy.  Per-group Python cost therefore scales with P
        # (constant), not with bucket count — a dup-heavy corpus (76k
        # collision buckets at 500k docs) spent 349 s in per-bucket pandas
        # calls before this shape, 4 s after.
        n_parts = min(64, n_buckets)

        def tag_bucket(batch: pa.Table) -> pa.Table:
            # vectorized semi-join: one pandas hash merge per batch instead
            # of a per-row Python dict probe
            bt = ray.get(keys_ref)
            df = pd.DataFrame(
                {c: batch.column(c).to_numpy() for c in group_cols}
            )
            df["doc_id"] = batch.column("doc_id").to_numpy()
            mg = df.merge(bt, on=group_cols, how="inner")
            docs = mg["doc_id"].to_numpy()
            mm = mg["m"].to_numpy()
            # over-cap buckets: deterministic doc_id % m sub-split
            bids = mg["bid"].to_numpy() + np.where(mm > 1, docs % mm, 0)
            return pa.table(
                {
                    "pid": pa.array(bids % n_parts, type=pa.int64()),
                    "bid": pa.array(bids, type=pa.int64()),
                    "doc_id": pa.array(docs, type=pa.int64()),
                }
            )

        pairs = (
            bands_ds.map_batches(
                tag_bucket, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("pid")
            .map_groups(_multi_bucket_pairs, batch_format="pandas")
        )
        # dedup (a pair can collide in several bands) in coarse partitions;
        # pairs stay a Dataset of int64 ids — materialized into the object
        # store, never pandas-on-driver
        from .groups import dedup_int_pairs

        pairs = dedup_int_pairs(pairs, ["doc_a", "doc_b"]).materialize()
    else:
        pairs = ray.data.from_arrow(_PAIR_SCHEMA.empty_table())
    if pairs.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], type=pa.int64()),
                    "doc_b": pa.array([], type=pa.int64()),
                    "jaccard": pa.array([], type=pa.float64()),
                }
            )
        )

    # candidate ids as a DATASET first (doc_a ∪ doc_b → coarse-partitioned
    # distinct): the driver learns only the COUNT before choosing a verify
    # strategy — on a dup-heavy crawl the candidate set is O(corpus) and
    # must never be materialized driver-side just to decide the split
    from .groups import dedup_int_pairs as _dedup_ids

    def pair_ids(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.concat_arrays(
                    [
                        batch.column("doc_a").combine_chunks(),
                        batch.column("doc_b").combine_chunks(),
                    ]
                )
            }
        )

    cands_ds = _dedup_ids(
        pairs.map_batches(pair_ids, batch_format="pyarrow", zero_copy_batch=True),
        ["doc_id"],
    ).materialize()
    n_cands = cands_ds.count()

    if n_cands <= broadcast_cands_threshold:
        # broadcast-join verify: the candidate-id set is PROVEN bounded by
        # the threshold before it is collected; the shingle map ships once
        # as compact raw bytes (unpickle ≈ memcpy, unlike a dict of
        # frozensets) and the verify is ONE map over the pair Dataset —
        # the right strategy while the candidate side fits a worker heap
        cand_ids: set[int] = set()
        for b in cands_ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
            cand_ids.update(b["doc_id"].to_pylist())
        cand_ref = ray.put(frozenset(cand_ids))

        def cand_shingles(batch: pa.Table) -> pa.Table:
            wanted = ray.get(cand_ref)
            ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            out_id, out_sh = [], []
            for d, t in zip(ids, texts):
                if d in wanted:
                    out_id.append(d)
                    # raw uint64 bytes: a simple nullable binary column
                    # joins through pandas without list/tensor coercion
                    out_sh.append(_shingle_hashes(t, shingle_n).tobytes())
            return pa.table(
                {
                    "doc_id": pa.array(out_id, type=pa.int64()),
                    "shingles": pa.array(out_sh, type=pa.binary()),
                }
            )

        sh_map: dict[int, bytes] = {}
        for b in docs.map_batches(
            cand_shingles, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_size=4096, batch_format="pyarrow"):
            for d, s in zip(b["doc_id"].to_pylist(), b["shingles"].to_pylist()):
                sh_map[d] = s
        sh_ref = ray.put(sh_map)

        def verify_bcast(batch: pa.Table) -> pa.Table:
            sh = ray.get(sh_ref)
            out_a, out_b, out_j = [], [], []
            for a_, b_ in zip(
                batch.column("doc_a").to_pylist(),
                batch.column("doc_b").to_pylist(),
            ):
                sa, sb = sh.get(a_), sh.get(b_)
                if sa is None or sb is None:
                    continue
                j = _jaccard_bytes(sa, sb)
                if j >= threshold:
                    out_a.append(a_)
                    out_b.append(b_)
                    # half-up rounding = SQL ROUND semantics
                    out_j.append(math.floor(j * 1e6 + 0.5) / 1e6)
            return pa.table(
                {
                    "doc_a": pa.array(out_a, type=pa.int64()),
                    "doc_b": pa.array(out_b, type=pa.int64()),
                    "jaccard": pa.array(out_j, type=pa.float64()),
                }
            )

        return pairs.map_batches(
            verify_bcast, batch_format="pyarrow", zero_copy_batch=True
        )

    # shuffle-join verify (the 100 TB path): candidates stay a DATASET end
    # to end.  Docs semi-join against cands_ds in coarse hash partitions
    # (one text-bearing exchange), then shingles are computed only for the
    # SURVIVORS — shingle work and materialized bytes stay bounded by the
    # candidate count even when the caller forces this arm on a corpus
    # with few duplicates, and the driver never holds a single id.
    from .groups import coarse_grouped as _coarse, int_pid as _ipid

    def tag_cand(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "text": pa.array([None] * n, type=pa.string()),
                "is_cand": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    def tag_doc(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "text": batch.column("text").cast(pa.string()),
                "is_cand": pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
            }
        )

    def semi_part(df: pd.DataFrame) -> pd.DataFrame:
        flags = df["is_cand"].to_numpy()
        wanted = set(df["doc_id"].to_numpy()[flags == 1].tolist())
        keep = df[(flags == 0) & df["doc_id"].isin(wanted)]
        return keep[["doc_id", "text"]]

    tagged = cands_ds.map_batches(
        tag_cand, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        docs.map_batches(tag_doc, batch_format="pyarrow", zero_copy_batch=True)
    )
    surviving = _coarse(
        tagged, lambda b: _ipid(b, ["doc_id"], 64), semi_part
    )

    def cand_shingles_ds(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "shingles": pa.array(
                    [_shingle_hashes(t, shingle_n).tobytes() for t in texts],
                    type=pa.binary(),
                ),
            }
        )

    shingles = surviving.map_batches(
        cand_shingles_ds, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # attach each side's shingles with a coarse-partitioned hash join
    # (functions/groups.py), then verify with C-kernel set intersections
    joined = attach_binary_column(
        attach_binary_column(
            pairs, shingles, "doc_a", ["doc_a", "doc_b"], out_col="sh_a"
        ),
        shingles,
        "doc_b",
        ["doc_a", "doc_b", "sh_a"],
        out_col="sh_b",
        binary_carry=("sh_a",),
    )

    def verify(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        sh_a = batch.column("sh_a").to_pylist()
        sh_b = batch.column("sh_b").to_pylist()
        for a_, b_, sa, sb in zip(
            batch.column("doc_a").to_pylist(),
            batch.column("doc_b").to_pylist(),
            sh_a,
            sh_b,
        ):
            if sa is None or sb is None:
                continue
            j = _jaccard_bytes(sa, sb)
            if j >= threshold:
                out_a.append(a_)
                out_b.append(b_)
                # half-up rounding = SQL ROUND semantics
                out_j.append(math.floor(j * 1e6 + 0.5) / 1e6)
        return pa.table(
            {
                "doc_a": pa.array(out_a, type=pa.int64()),
                "doc_b": pa.array(out_b, type=pa.int64()),
                "jaccard": pa.array(out_j, type=pa.float64()),
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


class SimHasher:
    """Actor-pool stage: doc → 64-bit simhash over token features.

    Token hash = md5-lower-uint64 (``md5_u64``) so the signature is exactly
    reproducible in SQL; votes are weighted by term frequency and fully
    vectorized over (distinct tokens × 64 bits).
    """

    def __init__(self):
        import re

        self._re = re.compile(TOKEN_RE.pattern)
        self._shifts = np.arange(64, dtype=np.uint64)

    def _simhash(self, tokens: list[str]) -> int:
        if not tokens:
            return 0
        from collections import Counter

        cnt = Counter(tokens)
        uniq = list(cnt)
        hs = np.fromiter(
            (md5_u64(t.encode()) for t in uniq), dtype=np.uint64, count=len(uniq)
        )
        w = np.fromiter((cnt[t] for t in uniq), dtype=np.int64, count=len(uniq))
        bits = ((hs[:, None] >> self._shifts) & np.uint64(1)).astype(np.int64)
        votes = (bits * w[:, None]).sum(axis=0) * 2 - w.sum()
        return int(np.sum((votes > 0).astype(np.uint64) << self._shifts))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out = [self._simhash(self._re.findall((t or "").lower())) for t in texts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(out, type=pa.uint64()),
            }
        )


def simhash_signatures(
    docs: ray.data.Dataset, concurrency: int | tuple | None = None
) -> ray.data.Dataset:
    return _launch_stage(
        docs,
        SimHasher,
        concurrency=concurrency,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array via byte unpacking."""
    return np.unpackbits(x.view(np.uint8).reshape(x.size, 8), axis=1).sum(
        axis=1, dtype=np.int64
    )


def simhash_dup_pairs(
    docs: ray.data.Dataset,
    *,
    max_hamming: int = 3,
    bucket_cap: int = DEFAULT_BUCKET_CAP,
    concurrency: int | tuple | None = None,
) -> ray.data.Dataset:
    """Near-dup pairs by simhash: 16-bit band buckets → verify Hamming dist.

    Returns a Dataset (doc_a, doc_b, hamming); a band bucket of ``n >
    bucket_cap`` docs is deterministically split into ``m = ceil(n/cap)``
    sub-buckets by ``doc_id % m`` (pairs form only within a sub-bucket), so
    per-bucket work stays O(cap²) with recall degrading gracefully ~1/m —
    never a silent drop.  The split rule is SQL-trivial, so the value
    oracle models it exactly.
    """
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

    # collision buckets via coarse-partitioned counting, then
    # coarse-partitioned numpy pair-gen (same shape as MinHash-LSH:
    # per-group Python scales with the partition count P, never with
    # bucket or corpus size; see functions/groups.py)
    from .groups import coarse_grouped, dedup_int_pairs, int_pid

    bands_ds = bands_ds.materialize()

    def count_buckets(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["band", "key"], as_index=False).size()
        return out.rename(columns={"size": "n"})

    counts = coarse_grouped(
        bands_ds.select_columns(["band", "key"]),
        lambda b: int_pid(b, ["key"], 64),
        count_buckets,
    )

    def only_multi(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(batch.column("n"), pa.scalar(2)))

    bid_by_band: dict[int, dict[int, tuple[int, int]]] = {}
    n_buckets = 0
    for bt in counts.map_batches(
        only_multi, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=8192, batch_format="pyarrow"):
        for band, key, n in zip(
            bt["band"].to_pylist(), bt["key"].to_pylist(), bt["n"].to_pylist()
        ):
            m = -(-int(n) // bucket_cap)  # ceil: sub-buckets of <= cap docs
            if m > 1:
                logger.warning(
                    "simhash: splitting band bucket of %d docs into %d "
                    "sub-buckets (cap %d; recall ~1/%d inside it)",
                    n,
                    m,
                    bucket_cap,
                    m,
                )
            bid_by_band.setdefault(band, {})[key] = (n_buckets, m)
            n_buckets += m
    if not n_buckets:
        return ray.data.from_arrow(
            pa.schema(
                [
                    ("doc_a", pa.int64()),
                    ("doc_b", pa.int64()),
                    ("hamming", pa.int64()),
                ]
            ).empty_table()
        )
    keys_ref = ray.put(bid_by_band)
    n_parts = min(64, n_buckets)

    def tag_bucket(batch: pa.Table) -> pa.Table:
        wanted = ray.get(keys_ref)
        bandc = batch.column("band").to_pylist()
        keyc = batch.column("key").to_pylist()
        docc = batch.column("doc_id").to_numpy()
        shc = batch.column("simhash").to_numpy()
        bids = np.empty(len(bandc), dtype=np.int64)
        keep = np.zeros(len(bandc), dtype=bool)
        for i, (bd, kk) in enumerate(zip(bandc, keyc)):
            entry = wanted.get(bd, {}).get(kk)
            if entry is not None:
                start, m = entry
                keep[i] = True
                # over-cap buckets: deterministic doc_id % m sub-split
                bids[i] = start + (int(docc[i]) % m if m > 1 else 0)
        bids = bids[keep]
        return pa.table(
            {
                "pid": pa.array(bids % n_parts, type=pa.int64()),
                "bid": pa.array(bids, type=pa.int64()),
                "doc_id": pa.array(docc[keep], type=pa.int64()),
                "simhash": pa.array(shc[keep], type=pa.uint64()),
            }
        )

    def multi_bucket_ham_pairs(group: pd.DataFrame) -> pd.DataFrame:
        bid = group["bid"].to_numpy()
        ids = group["doc_id"].to_numpy()
        hs = group["simhash"].to_numpy().astype(np.uint64)
        order = np.lexsort((ids, bid))
        bid, ids, hs = bid[order], ids[order], hs[order]
        out_a, out_b, out_h = [], [], []
        for s, e in zip(*_bucket_spans(bid)):
            if e - s < 2:
                continue
            ia, ib = np.triu_indices(e - s, k=1)
            seg_i, seg_h = ids[s:e], hs[s:e]
            ham = _popcount64(seg_h[ia] ^ seg_h[ib])
            ok = ham <= max_hamming
            out_a.append(seg_i[ia][ok])
            out_b.append(seg_i[ib][ok])
            out_h.append(ham[ok])
        if not out_a:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64"),
                    "hamming": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(out_a),
                "doc_b": np.concatenate(out_b),
                "hamming": np.concatenate(out_h),
            }
        )

    pairs = (
        bands_ds.map_batches(tag_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pid")
        .map_groups(multi_bucket_ham_pairs, batch_format="pandas")
    )
    # dedup across bands (hamming is identical wherever the pair collides)
    return dedup_int_pairs(
        pairs, ["doc_a", "doc_b"], agg={"hamming": ("hamming", "min")}
    )


def duplicate_clusters(
    pairs: ray.data.Dataset,
    *,
    max_iters: int = 16,
    driver_pairs_threshold: int = 2_000_000,
) -> ray.data.Dataset:
    """Connected components over a duplicate-pair list → (doc_id, cluster_id).

    The missing step between pair detection (exact/MinHash/SimHash/embedding)
    and corpus cleaning: pairs chain (A~B, B~C ⇒ {A,B,C} one cluster), so a
    keep-one-per-pair policy over-deletes or under-deletes.

    Two identical-result paths, picked by pair count (the pair list is
    bounded by the near-duplicate count, the same bound the LSH candidate
    set already relies on):

    - ``<= driver_pairs_threshold``: union-find on the driver (min-id root
      invariant), one pass over the pair batches — no per-round shuffles.
    - above it (the 100 TB path; force with ``driver_pairs_threshold=0``):
      label propagation in Dataset ops.  Each round, every node's label
      flows to all neighbors, then each node takes the min it received;
      both steps run inside COARSE hash partitions of the node id
      (functions/groups.py — Ray's per-group Python cost makes node-keyed
      groupbys O(#nodes)), so a round is two pid-shuffles of the edge list
      with pandas C-kernel merges inside.  Min-labels converge in
      O(component diameter) rounds; near-dup clusters are stars/cliques
      (diameter ≤ ~3), so the loop exits long before ``max_iters``.

    ``cluster_id`` = the component's min doc_id; only docs appearing in ≥1
    pair emit a row (singletons need no cleanup).  No corpus pass either
    way.
    """
    import pandas as pd

    from .groups import coarse_grouped, int_pid

    pairs = pairs.select_columns(["doc_a", "doc_b"]).materialize()
    if pairs.count() <= driver_pairs_threshold:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        seen: list[np.ndarray] = []
        for b in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
            aa = b["doc_a"].to_numpy()
            bb = b["doc_b"].to_numpy()
            seen.append(np.unique(np.concatenate([aa, bb])))
            for a_, b_ in zip(aa.tolist(), bb.tolist()):
                ra, rb = find(a_), find(b_)
                if ra != rb:
                    # min-id root invariant ⇒ final root == component min id
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
        out_nodes = np.unique(np.concatenate(seen)) if seen else np.zeros(0, np.int64)
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(out_nodes, type=pa.int64()),
                    "cluster_id": pa.array(
                        [find(int(n)) for n in out_nodes], type=pa.int64()
                    ),
                }
            )
        )

    # Edge list both directions, as (node, peer).
    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy().astype(np.int64)
        b = batch.column("doc_b").to_numpy().astype(np.int64)
        return pa.table(
            {
                "node": np.concatenate([a, b]),
                "peer": np.concatenate([b, a]),
            }
        )

    # materialized once: every propagation round unions the edge list into
    # its message stream, and the upstream pair pipeline (LSH + verify
    # joins) must not re-execute per round
    from .groups import compact_blocks

    edges = compact_blocks(
        pairs.select_columns(["doc_a", "doc_b"])
        .map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    def node_pid(batch: pa.Table) -> pa.Table:
        return int_pid(batch, ["node"], 64)

    def reduce_min(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False)["label"].min()

    # labels(node) := min(node, min over neighbors)
    def seed_labels(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "node": batch.column("node"),
                "label": pc.min_element_wise(
                    batch.column("node"), batch.column("peer")
                ),
            }
        )

    labels = coarse_grouped(
        edges.map_batches(seed_labels, batch_format="pyarrow", zero_copy_batch=True),
        node_pid,
        reduce_min,
    ).materialize()
    # per-round block discipline (the PageRank lesson, functions/graph.py):
    # union adds the edge blocks and the sort-based groupby preserves block
    # count, so labels would grow by ~edge_blocks blocks every round;
    # coalescing back to the incoming count keeps rounds constant-cost
    try:
        label_blocks = max(1, labels.num_blocks())
    except Exception:
        label_blocks = 64

    def spread(df: pd.DataFrame) -> pd.DataFrame:
        # kind 0 rows carry (node, peer=current label); kind 1 rows carry
        # (node, peer=neighbor).  Each node's label flows to every neighbor
        # and back to itself; a local min pre-reduce shrinks the shuffle.
        lab = df.loc[df["kind"] == 0, ["node", "peer"]].rename(
            columns={"peer": "label"}
        )
        edg = df.loc[df["kind"] == 1, ["node", "peer"]]
        sent = edg.merge(lab, on="node", how="inner")[["peer", "label"]].rename(
            columns={"peer": "node"}
        )
        out = pd.concat([sent, lab], ignore_index=True)
        return out.groupby("node", as_index=False)["label"].min()

    prev_sum = labels.sum("label")
    for _ in range(max_iters):
        def tag_label(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": batch.column("node"),
                    "peer": batch.column("label"),
                    "kind": np.zeros(batch.num_rows, dtype=np.int8),
                }
            )

        def tag_edge(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": batch.column("node"),
                    "peer": batch.column("peer"),
                    "kind": np.ones(batch.num_rows, dtype=np.int8),
                }
            )

        msgs = coarse_grouped(
            labels.map_batches(
                tag_label, batch_format="pyarrow", zero_copy_batch=True
            ).union(
                edges.map_batches(
                    tag_edge, batch_format="pyarrow", zero_copy_batch=True
                )
            ),
            node_pid,
            spread,
        )
        new_labels = (
            coarse_grouped(msgs, node_pid, reduce_min)
            .repartition(label_blocks)
            .materialize()
        )

        # convergence check: total label sum is monotone non-increasing and
        # strictly decreases while any label still moves — one tiny aggregate
        # per round (the previous round's sum is carried over, not recomputed)
        new_sum = new_labels.sum("label")
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("node").cast(pa.int64()),
                "cluster_id": batch.column("label").cast(pa.int64()),
            }
        )

    return labels.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def exact_dup_drops(docs: ray.data.Dataset) -> ray.data.Dataset:
    """doc_ids to DROP under exact dedup: every non-minimum doc_id per
    identical-text fingerprint group (keep-first semantics of
    ``exact_duplicates``, but emitting the complement)."""
    import pandas as pd

    from .groups import coarse_grouped, str_pid
    from .textstats import fingerprint_batch

    fps = docs.map_batches(
        fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True
    )

    def non_min(df: pd.DataFrame) -> pd.DataFrame:
        # all rows of a fingerprint share a coarse partition; the group min
        # is a C-kernel transform, never per-fp Python
        keep = df.groupby("fp")["doc_id"].transform("min")
        out = df.loc[df["doc_id"] != keep, ["doc_id"]]
        return out.astype({"doc_id": "int64"})

    return coarse_grouped(fps, lambda b: str_pid(b, "fp", 64), non_min)


def clean_corpus(
    docs: ray.data.Dataset,
    *,
    minhash_threshold: float = 0.4,
    **quality_thresholds,
) -> ray.data.Dataset:
    """The full training-data cleaning pipeline → surviving doc_id keep-list.

    A document survives iff it (a) passes the Gopher/C4-style
    ``quality_filter`` thresholds, (b) is the keep-first representative of
    its exact-duplicate group, and (c) is the canonical (min-id) member of
    its near-duplicate cluster (MinHash-LSH pairs → connected components).

    Fully distributed: quality is a pure map; exact drops are one
    fingerprint groupby; near-dup drops ride the LSH + label-propagation
    pipeline; the final combine is ONE hash shuffle of (doc_id, flag) pairs
    — no driver-side id sets, no broadcast of corpus-sized state, so the
    same plan runs at 10^12 docs.
    """
    from .groups import dedup_int_pairs
    from .textstats import quality_filter

    kept = quality_filter(docs, **quality_thresholds)

    clusters = duplicate_clusters(
        minhash_lsh_pairs(docs, threshold=minhash_threshold)
    )

    def non_canonical(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        cl = batch.column("cluster_id").to_numpy()
        return pa.table({"doc_id": pa.array(ids[ids != cl], type=pa.int64())})

    near_drops = clusters.map_batches(
        non_canonical, batch_format="pyarrow", zero_copy_batch=True
    )
    exact_drops = exact_dup_drops(docs)

    def tag(value: int):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch.column("doc_id").cast(pa.int64()),
                    "keep": np.full(batch.num_rows, value, dtype=np.int8),
                }
            )

        return fn

    merged = dedup_int_pairs(
        kept.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True).union(
            near_drops.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True),
            exact_drops.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True),
        ),
        ["doc_id"],
        agg={"dropped": ("keep", "min"), "quality_ok": ("keep", "max")},
    )

    def finish(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        keep = (batch.column("dropped").to_numpy() == 1) & (
            batch.column("quality_ok").to_numpy() == 1
        )
        return pa.table({"doc_id": pa.array(ids[keep], type=pa.int64())})

    return merged.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def dedup_keep_best(
    docs: ray.data.Dataset,
    *,
    minhash_threshold: float = 0.4,
    score_col: str = "n_chars",
) -> ray.data.Dataset:
    """Near-dup keep-list whose cluster survivor is the HIGHEST-``score_col``
    member (ties → lowest doc_id) — the RefinedWeb/Gopher "keep the longest
    page" policy, vs ``clean_corpus``'s keep-lowest-id canonicalization.
    Docs in no cluster all survive.

    Shapes: clusters ride the MinHash-LSH pipeline; the score attach is one
    coarse doc_id-hash shuffle (cluster rows ∪ score rows, pandas merge per
    partition); the per-cluster argmax is one coarse cluster_id-hash
    shuffle; the final subtraction is the same (doc_id, flag) min-combine
    as ``clean_corpus``.  Nothing corpus-sized touches the driver.
    ``docs`` must carry ``doc_id``, ``text`` and ``score_col``.
    """
    import pandas as pd

    from .groups import coarse_grouped, dedup_int_pairs, int_pid

    clusters = duplicate_clusters(
        minhash_lsh_pairs(docs, threshold=minhash_threshold)
    )

    def cl_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "cluster_id": batch.column("cluster_id").cast(pa.int64()),
                "score": pa.array(
                    np.full(batch.num_rows, -1, dtype=np.int64)
                ),
            }
        )

    def score_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "cluster_id": pa.array(
                    np.full(batch.num_rows, -1, dtype=np.int64)
                ),
                "score": batch.column(score_col).cast(pa.int64()),
            }
        )

    unioned = clusters.map_batches(
        cl_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        docs.map_batches(score_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        cl = df[df["cluster_id"] >= 0][["doc_id", "cluster_id"]]
        sc = df[df["cluster_id"] < 0][["doc_id", "score"]]
        return cl.merge(sc, on="doc_id", how="inner")

    scored = coarse_grouped(
        unioned, lambda b: int_pid(b, ["doc_id"], 64), attach
    )

    def drops_of_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["cluster_id", "score", "doc_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        losers = df[df["cluster_id"].duplicated(keep="first")]
        return losers[["doc_id"]]

    drops = coarse_grouped(
        scored, lambda b: int_pid(b, ["cluster_id"], 64), drops_of_partition
    )

    def tag(value: int):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch.column("doc_id").cast(pa.int64()),
                    "keep": np.full(batch.num_rows, value, dtype=np.int8),
                }
            )

        return fn

    merged = dedup_int_pairs(
        docs.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True).union(
            drops.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True)
        ),
        ["doc_id"],
        agg={"kept": ("keep", "min")},
    )

    def finish(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        keep = batch.column("kept").to_numpy() == 1
        return pa.table({"doc_id": pa.array(ids[keep], type=pa.int64())})

    return merged.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _token_window_hashes(text: str, window: int) -> list[int]:
    """md5-low64 hashes of every consecutive ``window``-token span (all
    occurrences, not deduplicated); SQL twin:
    ``md5_number_lower(array_to_string(toks[i:i+W-1], ' '))``."""
    toks = TOKEN_RE.findall((text or "").lower())
    if len(toks) < window:
        return []
    return [
        md5_u64(" ".join(toks[i : i + window]).encode())
        for i in range(len(toks) - window + 1)
    ]


# FNV-64 prime: odd → invertible mod 2^64, well-mixed under wraparound
_ROLL_BASE = np.uint64(0x100000001B3)


def _batch_window_hashes_rolling(
    texts: list[str], window: int
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized polynomial window hashes for a whole batch of texts.

    The 100 TB swap for the per-window-md5 map stage: per-token uint64
    siphashes (vectorized, dictionary-encoded — ``hashing.hash_terms_arrow``)
    combined into ``H(i) = Σ_j h(tok[i+j]) · B^(W-1-j) (mod 2^64)`` with W
    numpy multiply-adds over the CONCATENATED token stream, then windows
    that straddle a document boundary are masked out.  Same duplicated-span
    decisions as the md5 path (equal spans ⇒ equal hashes; collisions are
    2^-64), but no per-window string join / digest — the map stage drops
    from O(tokens·W) Python/md5 work to vectorized C.

    Returns ``(hashes, doc_index)`` — window hash + index of the source text
    in ``texts``.  Not SQL-reproducible; oracle runs keep ``hasher="md5"``.
    """
    from ..hashing import hash_terms_arrow

    tok_lists = [TOKEN_RE.findall((t or "").lower()) for t in texts]
    lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
    total = int(lens.sum())
    if total < window:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
    flat: list[str] = []
    for tl in tok_lists:
        flat.extend(tl)
    th = hash_terms_arrow(pa.array(flat, type=pa.string()))
    n_win = total - window + 1
    acc = np.zeros(n_win, dtype=np.uint64)
    # B^k mod 2^64 precomputed in Python ints (numpy scalar uint64 multiply
    # warns on intended wraparound; array ufuncs don't)
    pows = [1]
    for _ in range(window - 1):
        pows.append((pows[-1] * int(_ROLL_BASE)) & ((1 << 64) - 1))
    for j in range(window):  # j = offset within the window
        acc += th[j : j + n_win] * np.uint64(pows[window - 1 - j])
    # keep only windows fully inside one document
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)[:n_win]
    n_valid = np.maximum(lens - window + 1, 0)
    mask = np.zeros(n_win, dtype=bool)
    for s, nv in zip(starts, n_valid):
        if nv > 0:
            mask[s : s + nv] = True
    return acc[mask], doc_idx[mask]


def _explode_window_hashes(
    batch: pa.Table, window: int, hasher: str
) -> tuple[list[int] | np.ndarray, list[int] | np.ndarray]:
    """(window_hash, doc_id) streams for one batch under either hasher."""
    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    if hasher == "rolling":
        whs, di = _batch_window_hashes_rolling(texts, window)
        return whs, ids[di]
    out_wh: list[int] = []
    out_id: list[int] = []
    for d, t in zip(ids.tolist(), texts):
        whs = _token_window_hashes(t, window)
        out_wh.extend(whs)
        out_id.extend([d] * len(whs))
    return out_wh, out_id


def decontaminate(
    docs: ray.data.Dataset,
    eval_docs: ray.data.Dataset,
    *,
    window: int = 8,
    hasher: str = "md5",
) -> ray.data.Dataset:
    """Benchmark decontamination: corpus docs sharing any ``window``-token
    span with an eval/benchmark set → contaminated doc_id list.

    The standard pre-training hygiene op (n-gram-overlap decontamination):
    the eval side is tiny by definition, so its window-hash set is computed
    once and BROADCAST (``ray.put`` of a sorted uint64 array, not a pickled
    Python set); the corpus side is one shuffle-free linear scan with a
    vectorized ``searchsorted`` membership probe per doc.  ``hasher="md5"``
    (default) is the SQL-reproducible twin of ``substring_dup_stats``;
    ``hasher="rolling"`` is the 100 TB map kernel
    (``_batch_window_hashes_rolling``) — identical contamination decisions,
    no per-window md5.
    """
    if hasher not in ("md5", "rolling"):
        raise ValueError(f"unknown hasher {hasher!r}")
    eval_hashes: set[int] = set()
    for b in eval_docs.iter_batches(batch_size=4096, batch_format="pyarrow"):
        if hasher == "rolling":
            whs, _ = _batch_window_hashes_rolling(
                b.column("text").to_pylist(), window
            )
            eval_hashes.update(whs.tolist())
        else:
            for t in b.column("text").to_pylist():
                eval_hashes.update(_token_window_hashes(t, window))
    probe = np.sort(np.fromiter(eval_hashes, dtype=np.uint64, count=len(eval_hashes)))
    probe_ref = ray.put(probe)

    def flag(batch: pa.Table) -> pa.Table:
        probe_arr = ray.get(probe_ref)
        hit: list[int] = []
        if probe_arr.size:
            whs, ids = _explode_window_hashes(batch, window, hasher)
            whs = np.asarray(whs, dtype=np.uint64)
            ids = np.asarray(ids, dtype=np.int64)
            if whs.size:
                pos = np.searchsorted(probe_arr, whs)
                pos[pos == probe_arr.size] = 0
                contaminated = ids[probe_arr[pos] == whs]
                hit = np.unique(contaminated).tolist()
        return pa.table({"doc_id": pa.array(hit, type=pa.int64())})

    return docs.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def decontaminate_spans(
    docs: ray.data.Dataset,
    eval_docs: ray.data.Dataset,
    *,
    window: int = 8,
) -> ray.data.Dataset:
    """Decontamination with SPAN EVIDENCE: (doc_id, window_hash) per
    distinct contaminated ``window``-token span — the audit-trail form of
    :func:`decontaminate` (which only lists doc ids).  Same broadcast
    sorted-probe shape: eval window hashes are computed once and shipped
    by ``ray.put``; the corpus streams through one column-pruned scan, and
    each task emits its batch's distinct (doc, span) hits.  md5 window
    hashes only (the SQL-reproducible arm)."""
    eval_hashes: set[int] = set()
    for b in eval_docs.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for t in b.column("text").to_pylist():
            eval_hashes.update(_token_window_hashes(t, window))
    probe = np.sort(
        np.fromiter(eval_hashes, dtype=np.uint64, count=len(eval_hashes))
    )
    probe_ref = ray.put(probe)

    def spans(batch: pa.Table) -> pa.Table:
        probe_arr = ray.get(probe_ref)
        out_id = np.zeros(0, dtype=np.int64)
        out_wh = np.zeros(0, dtype=np.uint64)
        if probe_arr.size:
            whs, ids = _explode_window_hashes(batch, window, "md5")
            whs = np.asarray(whs, dtype=np.uint64)
            ids = np.asarray(ids, dtype=np.int64)
            if whs.size:
                pos = np.searchsorted(probe_arr, whs)
                pos[pos == probe_arr.size] = 0
                hit = probe_arr[pos] == whs
                if hit.any():
                    pairs = np.unique(
                        np.stack([ids[hit].astype(np.uint64), whs[hit]]),
                        axis=1,
                    )
                    out_id = pairs[0].astype(np.int64)
                    out_wh = pairs[1]
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "window_hash": pa.array(out_wh, type=pa.uint64()),
            }
        )

    return docs.map_batches(spans, batch_format="pyarrow", zero_copy_batch=True)


def substring_dup_stats(
    docs: ray.data.Dataset,
    *,
    window: int = 8,
    n_parts: int = 64,
    hasher: str = "md5",
) -> ray.data.Dataset:
    """Exact substring-level duplication stats (Lee et al. 2021 shape).

    Every consecutive ``window``-token span of every document is hashed; a
    span *occurrence* is duplicated iff its span text occurs >= 2 times
    corpus-wide (within-doc repeats count — the suffix-array dedup paper's
    "repeated substring" criterion at fixed granularity).  Output one row
    per document with at least one span:
    ``(doc_id, n_windows, n_dup_windows, dup_frac)``; docs shorter than
    ``window`` tokens emit nothing (no span can be duplicated).

    Distributed shape — never a corpus-cardinality Ray group key:

    1. map: tokenize + hash each span (md5-low64 of the space-joined token
       window — the SQL twin is ``md5_number_lower(array_to_string(...))``,
       so the driver oracle checks values);
    2. one coarse hash shuffle of (span_hash, doc_id) pairs → per-partition
       pandas ``transform('size')`` flags each occurrence (all occurrences
       of one span share a partition by construction);
    3. one coarse hash shuffle of (doc_id, dup) pairs → per-doc counts.

    ``hasher="rolling"`` swaps the md5-per-span map cost for the vectorized
    polynomial kernel (``_batch_window_hashes_rolling``) — the 100 TB path,
    identical dup decisions, no SQL twin; ``hasher="md5"`` (default) keeps
    the exactly-SQL-checkable map the driver oracle pins.  The shuffle
    shape is unchanged either way.  Reference analogue: vexor has only
    whole-text dedup (`vexor/search.py:194-206`); this is the training-data
    extension the task brief asks for.
    """
    if hasher not in ("md5", "rolling"):
        raise ValueError(f"unknown hasher {hasher!r}")
    from .groups import coarse_grouped, int_pid
    from .textstats import _round6_half_up

    def explode_windows(batch: pa.Table) -> pa.Table:
        out_wh, out_id = _explode_window_hashes(batch, window, hasher)
        return pa.table(
            {
                "wh": pa.array(np.asarray(out_wh, dtype=np.uint64)),
                "doc_id": pa.array(np.asarray(out_id, dtype=np.int64)),
            }
        )

    pairs = docs.map_batches(
        explode_windows, batch_format="pyarrow", zero_copy_batch=True
    )

    def flag_dups(df: pd.DataFrame) -> pd.DataFrame:
        occ = df.groupby("wh")["doc_id"].transform("size")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "dup": (occ >= 2).astype("int64"),
            }
        )

    flagged = coarse_grouped(
        pairs, lambda b: int_pid(b, ["wh"], n_parts), flag_dups, n_parts=n_parts
    )

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False).agg(
            n_windows=("dup", "size"), n_dup_windows=("dup", "sum")
        )
        g["dup_frac"] = [
            _round6_half_up(d / n)
            for d, n in zip(g["n_dup_windows"].tolist(), g["n_windows"].tolist())
        ]
        return g.astype(
            {"doc_id": "int64", "n_windows": "int64", "n_dup_windows": "int64"}
        )

    return coarse_grouped(
        flagged, lambda b: int_pid(b, ["doc_id"], n_parts), per_doc, n_parts=n_parts
    )


def _explode_window_hashes_pos(
    batch: pa.Table, window: int, hasher: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(window_hash, doc_id, start) streams for one batch — like
    ``_explode_window_hashes`` but with the 0-based token offset of each
    span within its document, which the rewrite op needs to locate covered
    tokens."""
    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    if hasher == "rolling":
        whs, di = _batch_window_hashes_rolling(texts, window)
        # windows of one doc come out consecutive and in order, so the
        # start offset is the rank within the doc's run
        if di.size:
            run_breaks = np.flatnonzero(np.diff(di)) + 1
            run_starts = np.concatenate([[0], run_breaks])
            run_lens = np.diff(np.concatenate([run_starts, [di.size]]))
            starts = np.arange(di.size, dtype=np.int64) - np.repeat(
                run_starts, run_lens
            )
        else:
            starts = np.zeros(0, dtype=np.int64)
        return whs, ids[di], starts
    out_wh: list[int] = []
    out_id: list[int] = []
    out_s: list[int] = []
    for d, t in zip(ids.tolist(), texts):
        whs = _token_window_hashes(t, window)
        out_wh.extend(whs)
        out_id.extend([d] * len(whs))
        out_s.extend(range(len(whs)))
    return (
        np.asarray(out_wh, dtype=np.uint64),
        np.asarray(out_id, dtype=np.int64),
        np.asarray(out_s, dtype=np.int64),
    )


def span_dedup_rewrite(
    docs: ray.data.Dataset,
    *,
    window: int = 8,
    n_parts: int = 64,
    hasher: str = "md5",
) -> ray.data.Dataset:
    """C4/RefinedWeb-style duplicate-span REMOVAL: rewrite every document so
    that of all corpus-wide occurrences of any duplicated ``window``-token
    span, only the first (smallest ``(doc_id, start)``) survives — the
    *removal* counterpart of ``substring_dup_stats``'s reporting.

    Semantics (exact, SQL-twinnable): a token at position ``p`` of doc ``d``
    is removed iff some duplicated span occurrence ``(d, s)`` with
    ``s <= p < s + window`` is NOT its span key's first occurrence.  Output
    is one row per input document: ``(doc_id, text, n_tokens, n_removed)``
    where ``text`` is the surviving tokens of the normalized token stream
    joined by single spaces ('' when everything was removed or the doc had
    no tokens) — the token-level rewrite the C4 paper applies at the line
    level and the suffix-array dedup paper (Lee et al. 2021) applies at the
    substring level.

    Distributed shape (no corpus-cardinality Ray group keys):

    1. map: explode ``(span_hash, doc_id, start)`` triples
       (``hasher="rolling"`` = the vectorized polynomial kernel, the 100 TB
       path; ``"md5"`` = the SQL-reproducible twin the driver oracle pins);
    2. one coarse hash shuffle on span_hash → per-partition pandas finds
       keys with >= 2 occurrences and emits every NON-FIRST occurrence as a
       removal span ``(doc_id, start)`` (all occurrences of one key share a
       partition by construction);
    3. one coarse hash shuffle on doc_id of (docs ∪ removal spans) → per
       partition, a difference-array coverage mask rewrites each doc
       (vectorized; the only per-doc Python is the final string join, which
       IS the output).

    Reference analogue: vexor has whole-text dedup only
    (`vexor/search.py:194-206`); this is the training-data extension the
    task brief asks for.
    """
    if hasher not in ("md5", "rolling"):
        raise ValueError(f"unknown hasher {hasher!r}")
    from .groups import coarse_grouped, int_pid

    def explode(batch: pa.Table) -> pa.Table:
        whs, ids, starts = _explode_window_hashes_pos(batch, window, hasher)
        return pa.table(
            {
                "wh": pa.array(whs),
                "doc_id": pa.array(ids),
                "start": pa.array(starts),
            }
        )

    spans = docs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def non_first_dups(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"doc_id": [], "start": []}).astype("int64")
        pos_key = df["doc_id"].to_numpy() * (1 << 32) + df["start"].to_numpy()
        g = df.assign(pos_key=pos_key).groupby("wh")["pos_key"]
        first = g.transform("min")
        size = g.transform("size")
        keep = (size >= 2) & (pos_key != first)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy()[keep.to_numpy()],
                "start": df["start"].to_numpy()[keep.to_numpy()],
            }
        ).astype("int64")

    removals = coarse_grouped(
        spans, lambda b: int_pid(b, ["wh"], n_parts), non_first_dups, n_parts=n_parts
    )

    def doc_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "start": pa.array(np.full(batch.num_rows, -1, dtype=np.int64)),
                "text": batch.column("text").cast(pa.string()),
            }
        )

    def rem_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "start": batch.column("start").cast(pa.int64()),
                "text": pa.array([None] * batch.num_rows, type=pa.string()),
            }
        )

    unioned = docs.map_batches(
        doc_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(removals.map_batches(rem_rows, batch_format="pyarrow", zero_copy_batch=True))

    def rewrite(df: pd.DataFrame) -> pd.DataFrame:
        doc_part = df[df["start"] < 0]
        rem = df[df["start"] >= 0]
        rem_by_doc: dict[int, np.ndarray] = {
            int(did): grp["start"].to_numpy()
            for did, grp in rem.groupby("doc_id")
        }
        out_id: list[int] = []
        out_text: list[str] = []
        out_n: list[int] = []
        out_rm: list[int] = []
        for did, text in zip(
            doc_part["doc_id"].tolist(), doc_part["text"].tolist()
        ):
            toks = TOKEN_RE.findall((text or "").lower())
            n = len(toks)
            starts = rem_by_doc.get(did)
            if starts is None or n == 0:
                out_id.append(did)
                out_text.append(" ".join(toks))
                out_n.append(n)
                out_rm.append(0)
                continue
            # difference-array coverage: O(n + #spans), no per-span slicing
            diff = np.zeros(n + 1, dtype=np.int64)
            np.add.at(diff, starts, 1)
            np.add.at(diff, np.minimum(starts + window, n), -1)
            covered = np.cumsum(diff[:-1]) > 0
            kept_idx = np.flatnonzero(~covered)
            out_id.append(did)
            out_text.append(" ".join(toks[i] for i in kept_idx))
            out_n.append(n)
            out_rm.append(int(n - kept_idx.size))
        return pd.DataFrame(
            {
                "doc_id": pd.array(out_id, dtype="int64"),
                "text": pd.array(out_text, dtype="string[pyarrow]"),
                "n_tokens": pd.array(out_n, dtype="int64"),
                "n_removed": pd.array(out_rm, dtype="int64"),
            }
        )

    return coarse_grouped(
        unioned, lambda b: int_pid(b, ["doc_id"], n_parts), rewrite, n_parts=n_parts
    )


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
