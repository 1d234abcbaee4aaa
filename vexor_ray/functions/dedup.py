"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Shapes follow the standard scale patterns (see Ray Data guide):

- **exact**: vectorized content-hash per batch → ``groupby(hash)`` keep the
  smallest doc_id (one small shuffle of (hash, doc_id) pairs, never text);
- **minhash_lsh**: per-batch shingle→minhash signatures (vectorized uint64
  numpy, no object dtype) → explode to (band, band_key, doc_id) rows →
  ``groupby`` band buckets (size-capped: a degenerate bucket is dropped and
  logged, never O(bucket²)-exploded) → candidate pairs as a *Dataset* →
  map-side exact-Jaccard verification against broadcast candidate shingle
  sets.  The driver never scans the corpus; it only collects the (small)
  candidate id list and their shingle sets.
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
    from .textstats import fingerprint_batch

    fps = docs.map_batches(fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True)
    from ray.data.aggregate import Count, Min

    out = fps.groupby("fp").aggregate(
        Count(alias_name="n_dups"), Min("doc_id", alias_name="keep_doc_id")
    )
    return out


_PAIR_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])


def _bucket_pairs_fn(cap: int):
    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(group["doc_id"].to_numpy())
        if ids.size < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        if ids.size > cap:
            logger.warning(
                "minhash-lsh: dropping band bucket of %d docs (> cap %d); "
                "recall for members of this bucket relies on their other bands",
                ids.size,
                cap,
            )
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        ia, ib = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    return bucket_pairs


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
) -> ray.data.Dataset:
    """MinHash-LSH near-dup candidate pairs verified by exact Jaccard.

    Returns a Dataset of (doc_a, doc_b, jaccard) with doc_a < doc_b and
    jaccard >= threshold.  Pipeline: signatures (actor pool) → band explode →
    band-bucket groupby (capped) → candidate-pair Dataset → map-side exact
    verification against broadcast candidate shingle sets.  The only
    driver-side materializations are the candidate id list and their shingle
    sets — both bounded by the number of near-duplicates, not corpus size.
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

    def explode_bands(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy()
        if doc_ids.size == 0:
            return pa.table(
                {
                    "band": pa.array([], type=pa.int32()),
                    "key": pa.array([], type=pa.string()),
                    "doc_id": pa.array([], type=pa.int64()),
                }
            )
        sig_arr = np.asarray(batch.column("sig").to_pylist(), dtype=np.uint32)
        out_band, out_key, out_doc = [], [], []
        for b in range(bands):
            rows = sig_arr[:, b * rows_per_band : (b + 1) * rows_per_band]
            # band key = '-'-joined signature values: unambiguous equality,
            # reproducible by SQL string_agg
            keys = ["-".join(map(str, r)) for r in rows.tolist()]
            out_band.append(np.full(doc_ids.size, b, dtype=np.int32))
            out_key.extend(keys)
            out_doc.append(doc_ids)
        return pa.table(
            {
                "band": pa.array(np.concatenate(out_band), type=pa.int32()),
                "key": pa.array(out_key, type=pa.string()),
                "doc_id": pa.array(np.concatenate(out_doc), type=pa.int64()),
            }
        )

    bands_ds = sigs.map_batches(explode_bands, batch_format="pyarrow", zero_copy_batch=True)
    pairs = (
        bands_ds.groupby(["band", "key"])
        .map_groups(_bucket_pairs_fn(bucket_cap), batch_format="pandas")
    )
    # dedup (a pair can collide in several bands); pairs are a tiny table of
    # int64 ids — materialized into the object store, never pandas-on-driver
    from ray.data.aggregate import Count

    pairs = (
        pairs.groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .materialize()
    )
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

    # candidate ids: small driver-side list (bounded by #near-dups)
    cand_ids: set[int] = set()
    for b in pairs.iter_batches(batch_size=8192, batch_format="pyarrow"):
        cand_ids.update(b["doc_a"].to_pylist())
        cand_ids.update(b["doc_b"].to_pylist())
    cand_ref = ray.put(frozenset(cand_ids))

    def cand_shingles(batch: pa.Table) -> pa.Table:
        wanted = ray.get(cand_ref)
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id, out_sh = [], []
        for d, t in zip(ids, texts):
            if d in wanted:
                out_id.append(d)
                out_sh.append(_shingle_hashes(t, shingle_n).tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "shingles": pa.array(out_sh, type=pa.list_(pa.uint64())),
            }
        )

    # distributed semi-join: full corpus streams through the filter; only
    # candidate rows (small) come back to build the broadcast shingle map
    sh_map: dict[int, frozenset[int]] = {}
    for b in docs.map_batches(
        cand_shingles, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=4096, batch_format="pyarrow"):
        for d, s in zip(b["doc_id"].to_pylist(), b["shingles"].to_pylist()):
            sh_map[d] = frozenset(s)
    sh_ref = ray.put(sh_map)

    def verify(batch: pa.Table) -> pa.Table:
        sh = ray.get(sh_ref)
        out_a, out_b, out_j = [], [], []
        for a_, b_ in zip(batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist()):
            sa, sb = sh.get(a_, frozenset()), sh.get(b_, frozenset())
            union = len(sa | sb)
            j = len(sa & sb) / union if union else 0.0
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

    return pairs.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


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

    Returns a Dataset (doc_a, doc_b, hamming); buckets beyond ``bucket_cap``
    are dropped and logged (same policy as MinHash-LSH).
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

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        if ids.size < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        if ids.size > bucket_cap:
            logger.warning(
                "simhash: dropping band bucket of %d docs (> cap %d)",
                ids.size,
                bucket_cap,
            )
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        hs = g["simhash"].to_numpy().astype(np.uint64)
        ia, ib = np.triu_indices(ids.size, k=1)
        ham = _popcount64(hs[ia] ^ hs[ib])
        keep = ham <= max_hamming
        return pd.DataFrame(
            {"doc_a": ids[ia][keep], "doc_b": ids[ib][keep], "hamming": ham[keep]}
        )

    pairs = bands_ds.groupby(["band", "key"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    from ray.data.aggregate import Min

    # dedup across bands (hamming is identical wherever the pair collides)
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


def duplicate_clusters(
    pairs: ray.data.Dataset, *, max_iters: int = 16
) -> ray.data.Dataset:
    """Connected components over a duplicate-pair list → (doc_id, cluster_id).

    The missing step between pair detection (exact/MinHash/SimHash/embedding)
    and corpus cleaning: pairs chain (A~B, B~C ⇒ {A,B,C} one cluster), so a
    keep-one-per-pair policy over-deletes or under-deletes.  Label propagation
    with min-id labels, expressed purely in Dataset ops:

    each round, every node's current label is sent to all neighbors via a
    ``groupby(node).map_groups`` over (edge ∪ label) rows, then reduced with
    ``groupby(node).min(label)``.  Min-labels converge in O(component
    diameter) rounds — near-dup clusters are stars/cliques (diameter ≤ ~3),
    so the loop exits early long before ``max_iters``; each round is two
    hash shuffles of the EDGE LIST only (no corpus pass, no driver-side
    edge materialization).  ``cluster_id`` = the component's min doc_id;
    only docs appearing in ≥1 pair emit a row (singletons need no cleanup).
    """
    import pandas as pd
    from ray.data.aggregate import Min

    # Edge list both directions, as (node, peer).  Self-loop per node keeps
    # the node's own label in play and guarantees every node emits a row.
    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy().astype(np.int64)
        b = batch.column("doc_b").to_numpy().astype(np.int64)
        return pa.table(
            {
                "node": np.concatenate([a, b]),
                "peer": np.concatenate([b, a]),
            }
        )

    edges = pairs.select_columns(["doc_a", "doc_b"]).map_batches(
        to_edges, batch_format="pyarrow", zero_copy_batch=True
    )

    # labels(node) := min(node, min over neighbors of their current label)
    def seed_labels(batch: pa.Table) -> pa.Table:
        nodes = batch.column("node")
        return pa.table({"node": nodes, "label": batch.column("peer")})

    labels = (
        edges.map_batches(seed_labels, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )

    def spread(group: pd.DataFrame) -> pd.DataFrame:
        # rows tagged kind 0 = label row (peer = current label of this node),
        # kind 1 = edge row (peer = neighbor id).  The node's label flows to
        # every neighbor; the node keeps its own label via a self row.
        lab = group.loc[group["kind"] == 0, "peer"]
        if lab.empty:
            return pd.DataFrame({"node": [], "label": []})
        label = int(lab.min())
        nbrs = group.loc[group["kind"] == 1, "peer"].astype("int64")
        nodes = list(nbrs) + [int(group["node"].iloc[0])]
        return pd.DataFrame({"node": nodes, "label": label})

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

        msgs = (
            labels.map_batches(tag_label, batch_format="pyarrow", zero_copy_batch=True)
            .union(
                edges.map_batches(tag_edge, batch_format="pyarrow", zero_copy_batch=True)
            )
            .groupby("node")
            .map_groups(spread, batch_format="pandas")
        )
        new_labels = msgs.groupby("node").aggregate(Min("label", alias_name="label")).materialize()

        # convergence check: total label sum is monotone non-increasing and
        # strictly decreases while any label still moves — one tiny aggregate,
        # no row-by-row driver comparison
        new_sum = new_labels.sum("label")
        old_sum = labels.sum("label")
        labels = new_labels
        if new_sum == old_sum:
            break

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

    from .textstats import fingerprint_batch

    fps = docs.map_batches(
        fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True
    )

    def non_min(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"doc_id": []}).astype({"doc_id": "int64"})
        keep = group["doc_id"].min()
        return pd.DataFrame(
            {"doc_id": group.loc[group["doc_id"] != keep, "doc_id"].astype("int64")}
        )

    return fps.groupby("fp").map_groups(non_min, batch_format="pandas")


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
    from ray.data.aggregate import Max, Min

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

    merged = (
        kept.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True)
        .union(
            near_drops.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True),
            exact_drops.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True),
        )
        .groupby("doc_id")
        .aggregate(
            Min("keep", alias_name="dropped"),
            Max("keep", alias_name="quality_ok"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        keep = (batch.column("dropped").to_numpy() == 1) & (
            batch.column("quality_ok").to_numpy() == 1
        )
        return pa.table({"doc_id": pa.array(ids[keep], type=pa.int64())})

    return merged.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


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
