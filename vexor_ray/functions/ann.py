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


def embedding_matrix(col) -> np.ndarray:
    """(n, dim) float64 matrix from a ``list<float>`` / fixed-size-list
    column WITHOUT the per-element Python round-trip of ``to_pylist()``:
    one C++ flatten + one buffer reshape (uniform row lengths — the only
    shape an embedding column can have).  Ragged/null rows fall back to the
    slow path so behavior is unchanged on malformed input."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    if col.null_count == 0:
        if pa.types.is_fixed_size_list(col.type):
            dim = col.type.list_size
            flat = pc.list_flatten(col)
        elif pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            lens = pc.list_value_length(col).to_numpy()
            if not (lens == lens[0]).all():
                return np.asarray(col.to_pylist(), dtype=np.float64)
            dim = int(lens[0])
            flat = pc.list_flatten(col)
        else:
            return np.asarray(col.to_pylist(), dtype=np.float64)
        vals = flat.to_numpy(zero_copy_only=False)
        return np.ascontiguousarray(vals, dtype=np.float64).reshape(n, dim)
    return np.asarray(col.to_pylist(), dtype=np.float64)


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
        mat = embedding_matrix(batch.column(vec_col))
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

    # partial top-k per block → one Ray reduce round over coalesced partials
    # (bounds driver rows by reduce_parts × nq × ~k instead of #blocks × …)
    partials = embeddings.map_batches(
        score_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return _reduce_topk(partials, k, "cosine")


def _merge_topk(batch: pa.Table, k: int, score_col: str) -> pa.Table:
    """Per-query top-k within a batch of partials, widened to every row
    tying the k-th (already-rounded) score — the same tie discipline as
    the map side, so any merge tree over partials is exact."""
    qi = batch.column("query_idx").to_numpy()
    ids = batch.column("vec_id").to_numpy()
    sims = batch.column(score_col).to_numpy()
    order = np.lexsort((ids, -sims, qi))
    qi, ids, sims = qi[order], ids[order], sims[order]
    keep = np.zeros(qi.size, dtype=bool)
    starts = np.flatnonzero(np.r_[True, qi[1:] != qi[:-1]])
    ends = np.r_[starts[1:], qi.size]
    for s, e in zip(starts, ends):
        if e - s <= k:
            keep[s:e] = True
        else:
            kth = sims[s + k - 1]
            keep[s : s + k] = True
            j = s + k
            while j < e and sims[j] == kth:
                keep[j] = True
                j += 1
    return pa.table(
        {
            "query_idx": pa.array(qi[keep], type=pa.int32()),
            "vec_id": pa.array(ids[keep], type=pa.int64()),
            score_col: pa.array(sims[keep], type=pa.float64()),
        }
    )


def _reduce_topk(
    partials: ray.data.Dataset, k: int, score_col: str
) -> pa.Table:
    """One Ray reduce round over per-block partial top-k tables, then the
    exact driver cut: (query_idx, rank, vec_id, score_col)."""

    def merge(batch: pa.Table) -> pa.Table:
        return _merge_topk(batch, k, score_col)

    reduce_parts = 8
    reduced = partials.repartition(reduce_parts).map_batches(
        merge, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    tables = list(reduced.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not tables:
        tables = [
            pa.table(
                {
                    "query_idx": pa.array([], type=pa.int32()),
                    "vec_id": pa.array([], type=pa.int64()),
                    score_col: pa.array([], type=pa.float64()),
                }
            )
        ]
    final = _merge_topk(pa.concat_tables(tables), k, score_col)
    qi = final.column("query_idx").to_numpy()
    ids = final.column("vec_id").to_numpy()
    sims = final.column(score_col).to_numpy()
    # exact cut at k (no tie-widening in the final output) + rank column
    out_q, out_r, out_id, out_s = [], [], [], []
    starts = np.flatnonzero(np.r_[True, qi[1:] != qi[:-1]]) if qi.size else []
    ends = np.r_[starts[1:], qi.size] if qi.size else []
    for s, e in zip(starts, ends):
        e = min(e, s + k)
        n = e - s
        out_q.append(qi[s:e])
        out_r.append(np.arange(1, n + 1, dtype=np.int32))
        out_id.append(ids[s:e])
        out_s.append(sims[s:e])
    cat = lambda xs, t: pa.array(
        np.concatenate(xs) if xs else np.array([], dtype="int64"), type=t
    )  # noqa: E731
    return pa.table(
        {
            "query_idx": cat(out_q, pa.int32()),
            "rank": cat(out_r, pa.int32()),
            "vec_id": cat(out_id, pa.int64()),
            score_col: cat(out_s, pa.float64()),
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
        mat = embedding_matrix(batch.column("embedding"))
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
            mat = embedding_matrix(batch.column(vec_col))
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
    wanted = ray.put(probed_union.astype(np.int64))

    def filter_cells(batch: pa.Table) -> pa.Table:
        cents = ray.get(c_ref)
        want = ray.get(wanted)
        mat = embedding_matrix(batch.column(vec_col))
        if mat.size == 0:
            return batch
        cells = ivf_assign_cells(mat, cents)
        return batch.filter(pa.array(np.isin(cells, want)))

    cands = embeddings.map_batches(
        filter_cells, batch_format="pyarrow", zero_copy_batch=True
    )
    return brute_force_topk(cands, np.asarray(queries, dtype=np.float64), k,
                            id_col=id_col, vec_col=vec_col)


# --------------------------------------------------------------------------
# Product quantization (Jégou, Douze, Schmid 2011 — "Product quantization
# for nearest neighbor search", public): the 100 TB memory path.  A 64-d
# float32 embedding is 256 B; its PQ code at m=8 is 8 B (32×), so the
# candidate store for ADC scanning fits in memory at corpus sizes where the
# raw embeddings never could.  Vectors are L2-normalized first, then each
# of m subspaces is vector-quantized independently (k-means); the ADC score
# sum_s <q_s, c_{s,code_s}> approximates the cosine.
# --------------------------------------------------------------------------


def pq_train(
    embeddings: ray.data.Dataset,
    *,
    m_subspaces: int = 8,
    k_codes: int = 256,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Distributed PQ codebooks: (m_subspaces, k_codes, dim/m) float64.

    Same deterministic map-reduce Lloyd discipline as :func:`ivf_train`:
    seeds are the ``k_codes`` vectors with the smallest md5(id) (their
    subvectors seed every subspace), each iteration broadcasts the
    codebooks and reduces per-(subspace, code) INTEGER partial sums of the
    2^20-quantized subvectors — bit-reproducible in any batch order.
    Assignment metric is L2 on the normalized vector's subvectors (ties →
    lowest code id).  Empty codes keep their previous centroid.
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
        order = np.argsort(hs, kind="stable")[:k_codes]
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
    seeds = seeds.sort_values("h", kind="mergesort").head(k_codes)
    seed_mat = _normalize(np.asarray(list(seeds[vec_col]), dtype=np.float64))
    dim = seed_mat.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    dsub = dim // m_subspaces
    n_seeds = seed_mat.shape[0]
    # every subspace starts from the same seed rows' subvectors; short
    # corpora (< k_codes rows) just train fewer codes
    books = np.zeros((m_subspaces, k_codes, dsub), dtype=np.float64)
    for s in range(m_subspaces):
        books[s, :n_seeds] = seed_mat[:, s * dsub : (s + 1) * dsub]

    for _ in range(iters):
        b_ref = ray.put(books)

        def partial_sums(batch: pa.Table) -> pa.Table:
            bks = ray.get(b_ref)
            mat = embedding_matrix(batch.column(vec_col))
            if mat.size == 0:
                return pa.table(
                    {
                        "sub": pa.array([], type=pa.int32()),
                        "code": pa.array([], type=pa.int32()),
                        "n": pa.array([], type=pa.int64()),
                        "vsum": pa.array([], type=pa.list_(pa.int64())),
                    }
                )
            nmat = _normalize(mat)
            q = np.floor(nmat * 1048576.0).astype(np.int64)  # exact scaling
            out_s, out_c, out_n, out_sum = [], [], [], []
            for s in range(m_subspaces):
                sub = nmat[:, s * dsub : (s + 1) * dsub]
                qsub = q[:, s * dsub : (s + 1) * dsub]
                codes = pq_assign_codes(sub, bks[s])
                for c in np.unique(codes):
                    sel = qsub[codes == c]
                    out_s.append(s)
                    out_c.append(int(c))
                    out_n.append(int(sel.shape[0]))
                    out_sum.append(sel.sum(axis=0).tolist())
            return pa.table(
                {
                    "sub": pa.array(out_s, type=pa.int32()),
                    "code": pa.array(out_c, type=pa.int32()),
                    "n": pa.array(out_n, type=pa.int64()),
                    "vsum": pa.array(out_sum, type=pa.list_(pa.int64())),
                }
            )

        parts = embeddings.map_batches(
            partial_sums, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
        new_b = books.copy()
        grouped = parts.groupby(["sub", "code"])
        for (s, c), rows in grouped:
            n = int(rows["n"].sum())
            if n == 0:
                continue
            total = np.sum(
                np.asarray(list(rows["vsum"]), dtype=np.int64), axis=0
            )  # exact int sum, order-free
            new_b[s, c] = total.astype(np.float64) / n / 1048576.0
        books = new_b
    return books


def pq_assign_codes(sub: np.ndarray, book: np.ndarray) -> np.ndarray:
    """Nearest code per subvector row (L2; ties → lowest code id)."""
    # argmin ||x - c||^2 == argmin (||c||^2 - 2 x·c); rounded like
    # ivf_assign_cells so assignment is stable at float boundaries
    d = (book * book).sum(axis=1)[None, :] - 2.0 * (sub @ book.T)
    return np.argmin(np.round(d, 9), axis=1)


def pq_encode(
    embeddings: ray.data.Dataset,
    codebooks: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """(id, code) dataset — m uint8 codes per vector, the compact ADC store."""
    m, _, dsub = codebooks.shape
    b_ref = ray.put(codebooks)

    def encode(batch: pa.Table) -> pa.Table:
        bks = ray.get(b_ref)
        ids = batch.column(id_col)
        mat = embedding_matrix(batch.column(vec_col))
        if mat.size == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "code": pa.array(
                        [], type=pa.list_(pa.uint8(), m)
                    ),
                }
            )
        nmat = _normalize(mat)
        codes = np.empty((nmat.shape[0], m), dtype=np.uint8)
        for s in range(m):
            codes[:, s] = pq_assign_codes(
                nmat[:, s * dsub : (s + 1) * dsub], bks[s]
            )
        return pa.table(
            {
                id_col: ids,
                "code": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.reshape(-1), type=pa.uint8()), m
                ),
            }
        )

    return embeddings.map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True
    )


def pq_adc_topk(
    codes: ray.data.Dataset,
    codebooks: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    rerank_embeddings: ray.data.Dataset | None = None,
    rerank_factor: int = 10,
    vec_col: str = "embedding",
) -> pa.Table:
    """Asymmetric-distance top-k over PQ codes → (query_idx, rank, vec_id,
    score).  score = sum_s LUT[s, code_s] with LUT[s, c] = <q_s, book[s,c]>
    (approximate cosine; rounded to 6, ties → vec_id asc).  The scan reads
    only the m-byte codes — the shape that fits a 100 TB corpus in memory.

    With ``rerank_embeddings`` the ADC pass generates ``k × rerank_factor``
    candidates per query and the true embeddings of just those candidates
    are exact-cosine reranked (the IVFADC+R discipline: quantization noise
    ~ reconstruction error scrambles near-tied neighbors, so ADC alone is a
    candidate generator, not a ranker).  Output column is then ``cosine``
    (exact), and the broadcast candidate-id set is bounded by
    nq × k × rerank_factor — never corpus-sized.
    """
    m, k_codes, dsub = codebooks.shape
    q = _normalize(np.asarray(queries, dtype=np.float64))  # (nq, dim)
    # LUTs: (nq, m, k_codes)
    luts = np.einsum(
        "qsd,scd->qsc", q.reshape(q.shape[0], m, dsub), codebooks
    )
    lut_ref = ray.put(luts)
    # the ADC pass must cut at the CANDIDATE count everywhere (map side
    # included), not at the final k, or reranking has nothing to rerank
    n_cand = k if rerank_embeddings is None else max(k, k * rerank_factor)

    def score_batch(batch: pa.Table) -> pa.Table:
        lt = ray.get(lut_ref)
        ids = batch.column(id_col).to_numpy()
        col = batch.column("code")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if ids.size == 0:
            return pa.table(
                {
                    "query_idx": pa.array([], type=pa.int32()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        cm = (
            col.flatten()
            .to_numpy(zero_copy_only=False)
            .reshape(ids.size, m)
            .astype(np.int64)
        )
        out_q, out_id, out_s = [], [], []
        for qi in range(lt.shape[0]):
            s = np.zeros(ids.size, dtype=np.float64)
            for sub in range(m):
                s += lt[qi, sub, cm[:, sub]]
            s = np.round(s, 6)
            if s.size > n_cand:
                kth = -np.partition(-s, n_cand - 1)[n_cand - 1]
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
                "score": pa.array(np.concatenate(out_s), type=pa.float64()),
            }
        )

    partials = codes.map_batches(
        score_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    if rerank_embeddings is None:
        return _reduce_topk(partials, k, "score")
    cands = _reduce_topk(partials, n_cand, "score")
    cand_ids = np.unique(cands.column("vec_id").to_numpy())
    ids_ref = ray.put(cand_ids)  # sorted; bounded by nq × k × rerank_factor

    def keep_cands(batch: pa.Table) -> pa.Table:
        want = ray.get(ids_ref)
        ids = batch.column(id_col).to_numpy()
        return batch.filter(pa.array(np.isin(ids, want)))

    pruned = rerank_embeddings.map_batches(
        keep_cands, batch_format="pyarrow", zero_copy_batch=True
    )
    return brute_force_topk(
        pruned,
        np.asarray(queries, dtype=np.float64),
        k,
        id_col=id_col,
        vec_col=vec_col,
    )


class SrpBandBucketer:
    """Actor-pool stage: one ``(key, vec_id)`` row per (vector, band).

    Band ``b`` uses planes ``j = b*n_planes .. (b+1)*n_planes - 1`` of the
    same md5-derived integer plane family (``srp_planes``); within a band
    the bit position is ``j % n_planes``.  ``key`` packs (band, bucket)
    EXACTLY — ``key = (band << n_planes) | bucket`` — so downstream
    grouping needs no string keys, no driver-assigned bucket ids, and no
    hash-collision caveats.
    """

    def __init__(self, dim: int, n_planes: int = 16, n_bands: int = 8,
                 seed: int = 5):
        self.n_planes = n_planes
        self.n_bands = n_bands
        self.planes = srp_planes(dim, n_planes * n_bands, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        if ids.size == 0:
            return pa.table(
                {
                    "key": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                }
            )
        mat = embedding_matrix(batch.column("embedding"))
        q = np.floor(mat * 1048576.0).astype(np.int64)  # *2^20 exact scaling
        bits = (q @ self.planes > 0).astype(np.int64)  # (n, n_planes*n_bands)
        shifts = np.arange(self.n_planes, dtype=np.int64)
        out_key, out_id = [], []
        for b in range(self.n_bands):
            band = bits[:, b * self.n_planes : (b + 1) * self.n_planes]
            bucket = (band << shifts).sum(axis=1)
            out_key.append((np.int64(b) << np.int64(self.n_planes)) | bucket)
            out_id.append(ids)
        return pa.table(
            {
                "key": pa.array(np.concatenate(out_key), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_id), type=pa.int64()),
            }
        )


def _bucket_pairs_df(keys: np.ndarray, ids: np.ndarray, cap: int):
    """Within-bucket (vec_a < vec_b) candidate pairs for every bucket in one
    coarse partition, bounded by ``cap``.

    A bucket of ``n > cap`` members is NEVER dropped: its members are
    deterministically hash-split into ``m = ceil(n / cap)`` sub-buckets
    (``md5_u64(str(vec_id)) % m`` — the exact expression the SQL twin
    recomputes) and pairs are generated within each sub-bucket.  Per-bucket
    cost stays O(cap·n) instead of O(n²); within-bucket recall degrades
    gracefully to ~1/m (members keep their other bands) rather than to
    zero — no silent coverage loss at any corpus size.
    """
    import logging

    import pandas as pd

    from .dedup import _bucket_spans, md5_u64

    logger = logging.getLogger(__name__)
    empty = pd.DataFrame(
        {
            "vec_a": pd.Series([], dtype="int64"),
            "vec_b": pd.Series([], dtype="int64"),
        }
    )
    if keys.size == 0:
        return empty
    order = np.lexsort((ids, keys))
    keys, ids = keys[order], ids[order]
    out_a, out_b = [], []

    def emit(seg: np.ndarray) -> None:
        ia, ib = np.triu_indices(seg.size, k=1)
        out_a.append(seg[ia])
        out_b.append(seg[ib])

    for s, e in zip(*_bucket_spans(keys)):
        n = int(e - s)  # python int: md5_u64 % np.int64 would promote the
        # uint64-range hash to float64 and corrupt the sub assignment
        if n < 2:
            continue
        seg = ids[s:e]
        if n <= cap:
            emit(seg)
            continue
        m = -(-n // cap)
        logger.warning(
            "embedding_dup_pairs: splitting band bucket of %d vectors into "
            "%d sub-buckets (cap %d); within-bucket recall ~1/%d, members "
            "keep their other bands",
            n,
            m,
            cap,
            m,
        )
        sub = np.fromiter(
            (md5_u64(str(int(i)).encode()) % m for i in seg),
            dtype=np.int64,
            count=n,
        )
        sub_order = np.lexsort((seg, sub))
        sub_s, seg_s = sub[sub_order], seg[sub_order]
        for ss, se in zip(*_bucket_spans(sub_s)):
            if se - ss >= 2:
                emit(seg_s[ss:se])
    if not out_a:
        return empty
    return pd.DataFrame(
        {"vec_a": np.concatenate(out_a), "vec_b": np.concatenate(out_b)}
    )


def ivf_pq_topk(
    embeddings: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    *,
    k_cells: int = 16,
    nprobe: int = 4,
    m_subspaces: int = 8,
    k_codes: int = 256,
    iters: int = 2,
    rerank_factor: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
) -> pa.Table:
    """IVFADC(+R) — the composed 100 TB ANN architecture (Jégou et al.
    2011): an IVF coarse quantizer restricts the scan to ``nprobe`` cells,
    the scan itself reads only m-byte PQ codes (ADC lookup sums), and the
    top ``k × rerank_factor`` ADC candidates are exact-cosine reranked
    from their true embeddings.

    One combined encode pass emits (id, cell, code); at query time only
    the probed-cell UNION's codes are scanned (the same union-probe
    semantics as :func:`ivf_topk` — per-query cell masks would prune
    slightly tighter at the cost of per-query scans).  Training is the
    deterministic integer-sum Lloyd of :func:`ivf_train` /
    :func:`pq_train`, so results are bit-reproducible run to run.  Pass
    ``centroids`` / ``codebooks`` to reuse trained quantizers.
    """
    if centroids is None:
        centroids = ivf_train(
            embeddings, k_cells=k_cells, iters=iters,
            id_col=id_col, vec_col=vec_col,
        )
    if codebooks is None:
        codebooks = pq_train(
            embeddings, m_subspaces=m_subspaces, k_codes=k_codes,
            iters=iters, id_col=id_col, vec_col=vec_col,
        )
    m, _, dsub = codebooks.shape
    c_ref = ray.put(centroids)
    b_ref = ray.put(codebooks)

    def encode(batch: pa.Table) -> pa.Table:
        cents = ray.get(c_ref)
        bks = ray.get(b_ref)
        ids = batch.column(id_col)
        mat = embedding_matrix(batch.column(vec_col))
        if mat.size == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "cell": pa.array([], type=pa.int32()),
                    "code": pa.array([], type=pa.list_(pa.uint8(), m)),
                }
            )
        nmat = _normalize(mat)
        cells = ivf_assign_cells(mat, cents).astype(np.int32)
        codes = np.empty((nmat.shape[0], m), dtype=np.uint8)
        for s_ in range(m):
            codes[:, s_] = pq_assign_codes(
                nmat[:, s_ * dsub : (s_ + 1) * dsub], bks[s_]
            )
        return pa.table(
            {
                id_col: ids,
                "cell": pa.array(cells, type=pa.int32()),
                "code": pa.array(
                    list(codes), type=pa.list_(pa.uint8(), m)
                ),
            }
        )

    codes_ds = embeddings.map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    q = _normalize(np.asarray(queries, dtype=np.float64))
    qsims = q @ centroids.T
    probe = np.argsort(np.round(-qsims, 9), axis=1, kind="stable")[:, :nprobe]
    probed_union = np.unique(probe)
    wanted = ray.put(probed_union.astype(np.int32))

    def filter_cells(batch: pa.Table) -> pa.Table:
        want = ray.get(wanted)
        cells = batch.column("cell").to_numpy()
        return batch.filter(pa.array(np.isin(cells, want)))

    cands = codes_ds.map_batches(
        filter_cells, batch_format="pyarrow", zero_copy_batch=True
    )
    return pq_adc_topk(
        cands,
        codebooks,
        np.asarray(queries, dtype=np.float64),
        k,
        id_col=id_col,
        rerank_embeddings=embeddings,
        rerank_factor=rerank_factor,
        vec_col=vec_col,
    )


def embedding_dup_pairs(
    embeddings: ray.data.Dataset,
    *,
    threshold: float = 0.4,
    n_planes: int = 16,
    n_bands: int = 8,
    seed: int = 5,
    bucket_cap: int = 4096,
    concurrency: int | tuple | None = None,
    broadcast_cands_threshold: int = 1_000_000,
) -> ray.data.Dataset:
    """Embedding-cosine near-dup pairs via multi-band SRP blocking.

    Shape mirrors ``dedup.minhash_lsh_pairs`` — the scale-proven LSH
    pipeline — not single-bucket blocking:

    1. each vector lands in ``n_bands`` independent sign-random-projection
       buckets of ``n_planes`` bits each (recall compounds across bands
       like MinHash banding; a pair missed by one band collides in
       another);
    2. within-bucket candidate pairs are generated for MANY buckets per
       group call inside ``n_parts`` coarse hash partitions of the exact
       packed ``(band, bucket)`` integer key — per-group Python cost is
       O(P), never O(bucket count), and there is NO bucket-keyed
       ``map_groups`` anywhere;
    3. a pair colliding in several bands is deduplicated by
       ``dedup_int_pairs`` (coarse-partitioned distinct);
    4. exact cosine verification: candidate embeddings ship once as a
       compact float64-bytes broadcast while they fit
       (``broadcast_cands_threshold``), else they stay a Dataset and
       attach to each pair side via two coarse hash joins
       (``dedup.attach_binary_column`` — the 100 TB path, force with
       ``broadcast_cands_threshold=0``).

    Buckets beyond ``bucket_cap`` are deterministically hash-split into
    ``ceil(n/cap)`` sub-buckets (see ``_bucket_pairs_df``) — degenerate
    buckets degrade recall gracefully instead of dropping coverage, and
    per-bucket pair cost stays O(cap·n).  Fully deterministic: integer md5
    planes + floor-quantized embeddings + md5 sub-split → the SQL oracle
    reproduces the exact candidate set, cap behavior included.
    """
    import logging

    import pandas as pd

    from .groups import coarse_grouped, dedup_int_pairs, int_pid

    logger = logging.getLogger(__name__)
    empty = pa.table(
        {
            "vec_a": pa.array([], type=pa.int64()),
            "vec_b": pa.array([], type=pa.int64()),
            "cosine": pa.array([], type=pa.float64()),
        }
    )
    sample = embeddings.take(1)
    dim = len(sample[0]["embedding"])
    bucketed = _launch_stage(
        embeddings,
        SrpBandBucketer,
        {"dim": dim, "n_planes": n_planes, "n_bands": n_bands, "seed": seed},
        concurrency=concurrency,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def part_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """All within-bucket (vec_a < vec_b) pairs for every bucket in one
        coarse partition — one numpy pass over key-sorted runs."""
        return _bucket_pairs_df(
            df["key"].to_numpy(), df["vec_id"].to_numpy(), bucket_cap
        )

    pairs = coarse_grouped(
        bucketed, lambda b: int_pid(b, ["key"], 64), part_pairs
    )
    pairs = dedup_int_pairs(pairs, ["vec_a", "vec_b"]).materialize()
    if pairs.count() == 0:
        return ray.data.from_arrow(empty)

    n_pairs = pairs.count()

    def _vec_bytes_table(ids: np.ndarray, mat: np.ndarray) -> pa.Table:
        # raw float64 bytes per row: joins/broadcasts as one binary blob
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "vec": pa.array([row.tobytes() for row in mat], type=pa.binary()),
            }
        )

    def cand_vecs(batch: pa.Table) -> pa.Table:
        """Candidate rows only — used on the broadcast path, where the
        sorted candidate-id ARRAY (8 B/id, ≤ 2·n_pairs) is itself small."""
        wanted = ray.get(cand_ref)
        ids = batch.column("vec_id").to_numpy()
        mask = np.isin(ids, wanted)
        if not mask.any():
            return _vec_bytes_table(ids[:0], np.zeros((0, 0)))
        return _vec_bytes_table(
            ids[mask], embedding_matrix(batch.column("embedding"))[mask]
        )

    def all_vecs(batch: pa.Table) -> pa.Table:
        """Every row as key+bytes — the unbounded-safe join-path payload:
        nothing candidate-sized ever materializes on the driver (the coarse
        hash joins attach only keys that appear on a pair side anyway)."""
        ids = batch.column("vec_id").to_numpy()
        return _vec_bytes_table(ids, embedding_matrix(batch.column("embedding")))

    def _cos_bytes(ba: bytes, bb: bytes) -> float:
        va = np.frombuffer(ba, dtype=np.float64)
        vb = np.frombuffer(bb, dtype=np.float64)
        na = np.linalg.norm(va) or 1.0
        nb = np.linalg.norm(vb) or 1.0
        # dot of the NORMALIZED vectors (not dot/(na*nb)): same float
        # association as the oracle's normalized matmul, so a cosine landing
        # exactly on a 1e-6 rounding boundary rounds identically
        return float(np.round((va / na) @ (vb / nb), 6))

    def _verify_table(ids_a, ids_b, vs_a, vs_b) -> pa.Table:
        out_a, out_b, out_c = [], [], []
        for a_, b_, va, vb in zip(ids_a, ids_b, vs_a, vs_b):
            if va is None or vb is None:
                continue
            c = _cos_bytes(va, vb)
            if c >= threshold:
                out_a.append(a_)
                out_b.append(b_)
                out_c.append(c)
        return pa.table(
            {
                "vec_a": pa.array(out_a, type=pa.int64()),
                "vec_b": pa.array(out_b, type=pa.int64()),
                "cosine": pa.array(out_c, type=pa.float64()),
            }
        )

    if 2 * n_pairs <= broadcast_cands_threshold:
        # candidate ids collected driver-side ONLY on this guarded branch:
        # one sorted int64 numpy array, ≤ 2·n_pairs ≤ threshold entries —
        # a pathological similarity threshold can no longer inflate an
        # unbounded Python set (it routes to the join path below instead)
        id_parts: list[np.ndarray] = []
        for b in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
            id_parts.append(b["vec_a"].to_numpy())
            id_parts.append(b["vec_b"].to_numpy())
        cand_ref = ray.put(np.unique(np.concatenate(id_parts)))
        vec_map: dict[int, bytes] = {}
        for b in embeddings.map_batches(
            cand_vecs, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_size=4096, batch_format="pyarrow"):
            for d, v in zip(b["vec_id"].to_pylist(), b["vec"].to_pylist()):
                vec_map[d] = v
        vm_ref = ray.put(vec_map)

        def verify_bcast(batch: pa.Table) -> pa.Table:
            vm = ray.get(vm_ref)
            ids_a = batch.column("vec_a").to_pylist()
            ids_b = batch.column("vec_b").to_pylist()
            return _verify_table(
                ids_a, ids_b, [vm.get(a_) for a_ in ids_a], [vm.get(b_) for b_ in ids_b]
            )

        return pairs.map_batches(
            verify_bcast, batch_format="pyarrow", zero_copy_batch=True
        )

    # 100 TB path: embeddings stay a Dataset (keyed float64 bytes); attach
    # per pair side via coarse hash joins — NOTHING candidate-sized on the
    # driver, not even the id set (the joins drop non-pair keys themselves)
    from .dedup import attach_binary_column

    payload = embeddings.map_batches(
        all_vecs, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    joined = attach_binary_column(
        attach_binary_column(
            pairs,
            payload,
            "vec_a",
            ["vec_a", "vec_b"],
            out_col="v_a",
            payload_key="vec_id",
            payload_col="vec",
        ),
        payload,
        "vec_b",
        ["vec_a", "vec_b", "v_a"],
        out_col="v_b",
        payload_key="vec_id",
        payload_col="vec",
        binary_carry=("v_a",),
    )

    def verify_joined(batch: pa.Table) -> pa.Table:
        return _verify_table(
            batch.column("vec_a").to_pylist(),
            batch.column("vec_b").to_pylist(),
            batch.column("v_a").to_pylist(),
            batch.column("v_b").to_pylist(),
        )

    return joined.map_batches(
        verify_joined, batch_format="pyarrow", zero_copy_batch=True
    )


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
    n_planes: int = 16,
    n_bands: int = 8,
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
        embeddings,
        threshold=threshold,
        n_planes=n_planes,
        n_bands=n_bands,
        seed=seed,
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
