"""Product quantization: deterministic training, 32x compression, ADC recall."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from vexor_ray.functions.ann import (
    brute_force_topk,
    pq_adc_topk,
    pq_assign_codes,
    pq_encode,
    pq_train,
)


@pytest.fixture(scope="module")
def clustered(ray_session):
    import ray.data

    rng = np.random.default_rng(23)
    centers = rng.standard_normal((8, 32)) * 4
    vecs = np.concatenate(
        [c + rng.standard_normal((60, 32)) * 0.5 for c in centers]
    )
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float32())),
        }
    )
    return ray.data.from_arrow(tbl), vecs


def test_pq_train_deterministic(clustered):
    ds, _ = clustered
    b1 = pq_train(ds, m_subspaces=4, k_codes=16, iters=2)
    b2 = pq_train(ds, m_subspaces=4, k_codes=16, iters=2)
    assert b1.shape == (4, 16, 8)
    assert (b1 == b2).all()  # exact-integer reduction → bit-reproducible


def test_pq_train_rejects_indivisible_dim(clustered):
    ds, _ = clustered
    with pytest.raises(ValueError):
        pq_train(ds, m_subspaces=5)


def test_pq_codes_are_m_bytes(clustered):
    ds, vecs = clustered
    books = pq_train(ds, m_subspaces=4, k_codes=16, iters=1)
    codes = pq_encode(ds, books).to_pandas()
    assert len(codes) == len(vecs)
    assert all(len(c) == 4 for c in codes["code"])  # 4 B vs 128 B raw (32x)
    # codes reference trained entries only
    flat = np.concatenate([np.asarray(c) for c in codes["code"]])
    assert flat.max() < 16


def test_pq_assign_codes_ties_lowest():
    book = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    codes = pq_assign_codes(np.array([[1.0, 0.0]]), book)
    assert codes[0] == 0  # duplicate codewords → lowest id wins


def test_pq_adc_candidates_hit_cluster(clustered):
    """Raw ADC is a candidate generator: quantization noise (~recon error)
    scrambles NEAR-TIED neighbors, but candidates must come from the right
    region — every ADC top-10 of a cluster-member query stays inside that
    query's 60-vector cluster."""
    ds, vecs = clustered
    books = pq_train(ds, m_subspaces=8, k_codes=64, iters=2)
    codes = pq_encode(ds, books)
    q = vecs[::97][:5].astype(np.float64)
    approx = pq_adc_topk(codes, books, q, k=10).to_pandas()
    for qi, vid in enumerate(range(0, len(vecs), 97)):
        if qi >= 5:
            break
        cluster = vid // 60
        got = approx[approx["query_idx"] == qi]["vec_id"]
        assert (got // 60 == cluster).all()


def test_pq_adc_rerank_recall_vs_bruteforce(clustered):
    """ADC candidates + exact rerank (IVFADC+R): high recall, exact scores."""
    ds, vecs = clustered
    books = pq_train(ds, m_subspaces=8, k_codes=64, iters=2)
    codes = pq_encode(ds, books)
    q = vecs[::97][:5].astype(np.float64)
    exact = brute_force_topk(ds, q, k=10)
    approx = pq_adc_topk(
        codes, books, q, k=10, rerank_embeddings=ds, rerank_factor=10
    )
    ex = exact.to_pandas().groupby("query_idx")["vec_id"].apply(set)
    ap = approx.to_pandas().groupby("query_idx")["vec_id"].apply(set)
    hits = sum(len(ex[i] & ap[i]) for i in ex.index)
    total = sum(len(ex[i]) for i in ex.index)
    assert hits / total >= 0.9
    # reranked scores are EXACT cosines: rows shared with brute force agree
    exd = exact.to_pandas().set_index(["query_idx", "vec_id"])["cosine"]
    apd = approx.to_pandas().set_index(["query_idx", "vec_id"])["cosine"]
    shared = exd.index.intersection(apd.index)
    assert (exd[shared] == apd[shared]).all()


def test_pq_adc_deterministic(clustered):
    ds, vecs = clustered
    books = pq_train(ds, m_subspaces=4, k_codes=16, iters=1)
    codes = pq_encode(ds, books)
    q = vecs[:3].astype(np.float64)
    a = pq_adc_topk(codes, books, q, k=5).to_pandas()
    b = pq_adc_topk(codes, books, q, k=5).to_pandas()
    assert a.equals(b)
