"""Similarity search over an embedding column (``list<float>``).

- ``brute_force_topk``: the exact baseline — the query matrix is broadcast
  once (``ray.put``), each ``map_batches`` task does one numpy matmul of its
  batch against it and emits only its local top-k; the driver merges tiny
  partials.  This is the canonical "broadcast small side + partial top-k"
  shape: no shuffle, linear scan, scales with corpus size.
- ``lsh_topk``: the scale path — signed-random-projection LSH buckets
  (stateful planes, broadcast) restrict scoring to colliding buckets; exact
  cosine within candidates.  Approximate by construction → checked
  rows-only + recall assertions in unit tests, not value-hash.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ._pool import launch_stage as _launch_stage


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def brute_force_topk(
    embeddings: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Exact cosine top-k per query → (query_idx, rank, vec_id, cosine).

    Ties broken by vec_id ascending; cosine in float64, rounded to 6.
    """
    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q)

    def score_batch(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = batch.column(id_col).to_numpy()
        mat = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        if mat.size == 0:
            return pa.table(
                {
                    "query_idx": pa.array([], type=pa.int32()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        # round BEFORE the local cut, and widen the candidate set to every
        # row tying the k-th rounded score: exact duplicate embeddings at the
        # boundary then survive to the driver merge, so the documented
        # (cosine desc, vec_id asc) order is deterministic across any batch
        # split — and the driver merge is exact with only ~k rows per batch
        sims = np.round(_normalize(mat) @ qm.T, 6)  # (n, nq)
        out_q, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            s = sims[:, qi]
            if s.size > k:
                kth = -np.partition(-s, k - 1)[k - 1]
                cand = np.flatnonzero(s >= kth)
            else:
                cand = np.arange(s.size)
            order = np.lexsort((ids[cand], -s[cand]))
            sel = cand[order]
            out_q.append(np.full(sel.size, qi, dtype=np.int32))
            out_id.append(ids[sel])
            out_s.append(s[sel])
        return pa.table(
            {
                "query_idx": pa.array(np.concatenate(out_q), type=pa.int32()),
                "vec_id": pa.array(np.concatenate(out_id), type=pa.int64()),
                "cosine": pa.array(np.concatenate(out_s), type=pa.float64()),
            }
        )

    partials = embeddings.map_batches(
        score_batch, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    rows = {"query_idx": [], "rank": [], "vec_id": [], "cosine": []}
    for qi, grp in partials.groupby("query_idx"):
        grp = grp.sort_values(
            ["cosine", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        for rank, (_, r) in enumerate(grp.iterrows(), start=1):
            rows["query_idx"].append(int(qi))
            rows["rank"].append(rank)
            rows["vec_id"].append(int(r["vec_id"]))
            rows["cosine"].append(float(r["cosine"]))
    return pa.table(
        {
            "query_idx": pa.array(rows["query_idx"], type=pa.int32()),
            "rank": pa.array(rows["rank"], type=pa.int32()),
            "vec_id": pa.array(rows["vec_id"], type=pa.int64()),
            "cosine": pa.array(rows["cosine"], type=pa.float64()),
        }
    )


def srp_planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic integer SRP planes in [-1000, 1000], md5-derived.

    plane[d, j] = (md5_u64(f"srp|{seed}|{j}|{d}") % 2001) - 1000 — the exact
    expression a SQL oracle can recompute with ``md5_number_lower``.  Integer
    planes + floor-quantized embeddings make the sign bits bit-exact across
    engines (no float-summation-order ambiguity at the dot≈0 boundary).
    """
    from .dedup import md5_u64

    out = np.empty((dim, n_planes), dtype=np.int64)
    for j in range(n_planes):
        for d in range(dim):
            out[d, j] = md5_u64(f"srp|{seed}|{j}|{d}".encode()) % 2001 - 1000
    return out


def srp_buckets(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """bucket = sum_j (dot_j > 0) << j over integer-quantized embeddings."""
    q = np.floor(mat * 1048576.0).astype(np.int64)  # *2^20 is exact scaling
    dots = q @ planes
    bits = (dots > 0).astype(np.uint64)
    shifts = np.arange(planes.shape[1], dtype=np.uint64)
    return (bits << shifts).sum(axis=1, dtype=np.uint64)


class SrpBucketer:
    """Actor-pool stage: signed-random-projection bucket id per vector."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 5):
        self.planes = srp_planes(dim, n_planes, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        if mat.size == 0:
            bucket = np.zeros(0, dtype=np.uint64)
        else:
            bucket = srp_buckets(mat, self.planes)
        return batch.append_column("bucket", pa.array(bucket, type=pa.uint64()))


def ivf_train(
    embeddings: ray.data.Dataset,
    *,
    k_cells: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Distributed IVF coarse quantizer: (k_cells, dim) float64 centroids.

    Deterministic map-reduce Lloyd iterations with cosine assignment:

    - init = the ``k_cells`` vectors with the smallest md5(id) (a seeded
      uniform sample needing only a tiny per-batch partial top-k, no sort);
    - each iteration: broadcast centroids → per-batch assign + per-cell
      INTEGER partial sums of the 2^20-quantized vectors → driver combine.
      Integer sums are exact in any batch order, so centroids (and
      therefore cell assignments) are bit-reproducible run to run — the
      property every approximate-recall test and future SQL oracle needs.
    Empty cells keep their previous centroid.
    """
    import pyarrow.compute as pc

    from .dedup import md5_u64

    def seed_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        if not ids:
            return pa.table(
                {
                    "h": pa.array([], type=pa.uint64()),
                    id_col: pa.array([], type=pa.int64()),
                    vec_col: pa.array([], type=pa.list_(pa.float32())),
                }
            )
        hs = np.fromiter(
            (md5_u64(str(i).encode()) for i in ids), dtype=np.uint64, count=len(ids)
        )
        order = np.argsort(hs, kind="stable")[:k_cells]
        return pa.table(
            {
                "h": pa.array(hs[order], type=pa.uint64()),
                id_col: pc.take(batch.column(id_col), pa.array(order)),
                vec_col: pc.take(batch.column(vec_col), pa.array(order)),
            }
        )

    seeds = embeddings.map_batches(
        seed_partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    seeds = seeds.sort_values("h", kind="mergesort").head(k_cells)
    centroids = _normalize(
        np.asarray(list(seeds[vec_col]), dtype=np.float64)
    )
    dim = centroids.shape[1]

    for _ in range(iters):
        c_ref = ray.put(centroids)

        def partial_sums(batch: pa.Table) -> pa.Table:
            cents = ray.get(c_ref)
            mat = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
            if mat.size == 0:
                return pa.table(
                    {
                        "cell": pa.array([], type=pa.int32()),
                        "n": pa.array([], type=pa.int64()),
                        "vsum": pa.array([], type=pa.list_(pa.int64())),
                    }
                )
            q = np.floor(mat * 1048576.0).astype(np.int64)  # exact scaling
            cell = ivf_assign_cells(mat, cents)
            out_cell, out_n, out_sum = [], [], []
            for c in np.unique(cell):
                sel = q[cell == c]
                out_cell.append(int(c))
                out_n.append(int(sel.shape[0]))
                out_sum.append(sel.sum(axis=0).tolist())
            return pa.table(
                {
                    "cell": pa.array(out_cell, type=pa.int32()),
                    "n": pa.array(out_n, type=pa.int64()),
                    "vsum": pa.array(out_sum, type=pa.list_(pa.int64())),
                }
            )

        parts = embeddings.map_batches(
            partial_sums, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
        new_c = centroids.copy()
        for c in range(k_cells):
            rows = parts[parts["cell"] == c]
            n = int(rows["n"].sum())
            if n == 0:
                continue
            total = np.sum(
                np.asarray(list(rows["vsum"]), dtype=np.int64), axis=0
            )  # exact int sum, order-free
            new_c[c] = total.astype(np.float64) / n / 1048576.0
        centroids = _normalize(new_c)
    return centroids


def ivf_assign_cells(mat: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest-centroid cell per row (cosine; ties → lowest cell id)."""
    sims = _normalize(mat) @ centroids.T
    return np.argmax(np.round(sims, 9), axis=1)


def ivf_topk(
    embeddings: ray.data.Dataset,
    centroids: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    *,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """IVF search: probe the ``nprobe`` nearest cells per query, exact
    cosine within the probed union — the trained-quantizer scale path
    (cells are recomputed per batch from the broadcast centroids; no
    assignment join, no shuffle)."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    qsims = q @ centroids.T
    probe = np.argsort(np.round(-qsims, 9), axis=1, kind="stable")[:, :nprobe]
    probed_union = np.unique(probe)
    c_ref = ray.put(centroids)
    wanted = ray.put(frozenset(int(c) for c in probed_union))

    def filter_cells(batch: pa.Table) -> pa.Table:
        cents = ray.get(c_ref)
        want = ray.get(wanted)
        mat = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        if mat.size == 0:
            return batch
        cells = ivf_assign_cells(mat, cents)
        keep = np.fromiter((int(c) in want for c in cells), dtype=bool,
                           count=cells.size)
        return batch.filter(pa.array(keep))

    cands = embeddings.map_batches(
        filter_cells, batch_format="pyarrow", zero_copy_batch=True
    )
    return brute_force_topk(cands, np.asarray(queries, dtype=np.float64), k,
                            id_col=id_col, vec_col=vec_col)


def embedding_dup_pairs(
    embeddings: ray.data.Dataset,
    *,
    threshold: float = 0.4,
    n_planes: int = 4,
    seed: int = 5,
    bucket_cap: int = 4096,
    concurrency: int | tuple | None = None,
) -> ray.data.Dataset:
    """Embedding-cosine near-dup pairs via SRP bucket blocking.

    Each vector lands in exactly one bucket, so a candidate pair is tested
    at most once (no dedup shuffle); within a bucket the pairwise cosine is
    one matmul.  Approximate by construction (cross-bucket pairs are
    missed — standard LSH recall trade-off, raise ``n_planes`` bands for
    recall), but fully deterministic: integer md5 planes → the SQL oracle
    reproduces the exact pair set.  Buckets beyond ``bucket_cap`` are
    dropped and logged (degenerate-bucket guard).
    """
    import logging

    import pandas as pd

    logger = logging.getLogger(__name__)
    sample = embeddings.take(1)
    dim = len(sample[0]["embedding"])
    bucketed = _launch_stage(
        embeddings,
        SrpBucketer,
        {"dim": dim, "n_planes": n_planes, "seed": seed},
        concurrency=concurrency,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "vec_a": pd.Series([], dtype="int64"),
                "vec_b": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )
        if len(g) < 2:
            return empty
        if len(g) > bucket_cap:
            logger.warning(
                "embedding_dup_pairs: dropping bucket of %d vectors (> cap %d)",
                len(g),
                bucket_cap,
            )
            return empty
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        mat = _normalize(np.asarray(list(g["embedding"]), dtype=np.float64))
        sims = np.round(mat @ mat.T, 6)
        ia, ib = np.triu_indices(ids.size, k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "vec_a": ids[ia[keep]].astype("int64"),
                "vec_b": ids[ib[keep]].astype("int64"),
                "cosine": sims[ia[keep], ib[keep]],
            }
        )

    return bucketed.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")


def lsh_topk(
    embeddings: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    *,
    n_planes: int = 12,
    seed: int = 5,
    concurrency: int | tuple | None = None,
) -> pa.Table:
    """Approximate cosine top-k: probe only the query's SRP bucket."""
    q = np.asarray(queries, dtype=np.float64)
    dim = q.shape[1]
    qbuckets = srp_buckets(q, srp_planes(dim, n_planes, seed))

    bucketed = _launch_stage(
        embeddings,
        SrpBucketer,
        {"dim": dim, "n_planes": n_planes, "seed": seed},
        concurrency=concurrency,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    wanted = pa.array(np.unique(qbuckets), type=pa.uint64())
    import pyarrow.compute as pc

    cands = bucketed.map_batches(
        lambda t: t.filter(pc.is_in(t["bucket"], value_set=wanted)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return brute_force_topk(cands, q, k)


def embedding_dup_clusters(
    embeddings: "ray.data.Dataset",
    *,
    threshold: float = 0.4,
    n_planes: int = 4,
    seed: int = 5,
) -> "ray.data.Dataset":
    """SemDeDup-style semantic dedup: near-dup cosine pairs → connected
    components → ``(vec_id, cluster_id)`` with cluster_id = min member id.

    Composes ``embedding_dup_pairs`` (SRP-blocked exact-cosine pairs) with
    the same label-propagation components used for text near-dups
    (``dedup.duplicate_clusters``), so a keep-min-id policy per cluster is
    a pure filter on the output.  Only vectors in >= 1 pair emit a row.
    """
    import pyarrow as pa

    from .dedup import duplicate_clusters

    pairs = embedding_dup_pairs(
        embeddings, threshold=threshold, n_planes=n_planes, seed=seed
    )

    def rename_in(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_a": batch.column("vec_a"),
                "doc_b": batch.column("vec_b"),
            }
        )

    clusters = duplicate_clusters(
        pairs.map_batches(rename_in, batch_format="pyarrow", zero_copy_batch=True)
    )

    def rename_out(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": batch.column("doc_id"),
                "cluster_id": batch.column("cluster_id"),
            }
        )

    return clusters.map_batches(
        rename_out, batch_format="pyarrow", zero_copy_batch=True
    )
