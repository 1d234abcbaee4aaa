"""IVF-flat ANN: deterministic training, recall, self-hits."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from vexor_ray.functions.ann import (
    brute_force_topk,
    ivf_assign_cells,
    ivf_topk,
    ivf_train,
)


@pytest.fixture(scope="module")
def clustered(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 32)) * 4
    vecs = np.concatenate(
        [c + rng.standard_normal((60, 32)) for c in centers]
    )
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float32())),
        }
    )
    return ray.data.from_arrow(tbl), vecs


def test_ivf_train_deterministic(clustered):
    ds, _ = clustered
    c1 = ivf_train(ds, k_cells=8, iters=2)
    c2 = ivf_train(ds, k_cells=8, iters=2)
    assert c1.shape == (8, 32)
    assert (c1 == c2).all()  # exact-integer reduction → bit-reproducible


def test_ivf_cells_cover_clusters(clustered):
    ds, vecs = clustered
    cents = ivf_train(ds, k_cells=8, iters=2)
    cells = ivf_assign_cells(vecs.astype(np.float64), cents)
    # clustered data → every trained cell holds a reasonable population
    # and the 8 clusters land in at least 5 distinct cells
    assert len(np.unique(cells)) >= 5


def test_ivf_topk_recall_vs_bruteforce(clustered):
    ds, vecs = clustered
    cents = ivf_train(ds, k_cells=8, iters=2)
    q = vecs[:5].astype(np.float64)
    exact = brute_force_topk(ds, q, k=5)
    approx = ivf_topk(ds, cents, q, k=5, nprobe=3)
    ex = exact.to_pandas().groupby("query_idx")["vec_id"].apply(list)
    ap = approx.to_pandas().groupby("query_idx")["vec_id"].apply(list)
    hits = total = 0
    for qi in range(5):
        got = set(ap.get(qi, []))
        want = ex[qi]
        hits += sum(1 for v in want if v in got)
        total += len(want)
        # the query vector itself must always come back first
        assert ap[qi][0] == qi
    assert hits / total >= 0.8  # nprobe=3 of 8 cells on clustered data


def test_ivf_pq_topk_recall_and_reproducibility(clustered):
    from vexor_ray.functions.ann import ivf_pq_topk

    ds, vecs = clustered
    q = vecs[:5].astype(np.float64)
    exact = brute_force_topk(ds, q, k=5)
    a1 = ivf_pq_topk(ds, q, k=5, k_cells=8, nprobe=3, m_subspaces=8,
                     k_codes=64, rerank_factor=10)
    a2 = ivf_pq_topk(ds, q, k=5, k_cells=8, nprobe=3, m_subspaces=8,
                     k_codes=64, rerank_factor=10)
    assert a1.to_pandas().equals(a2.to_pandas())  # bit-reproducible
    ex = exact.to_pandas().groupby("query_idx")["vec_id"].apply(list)
    ap = a1.to_pandas().groupby("query_idx")["vec_id"].apply(list)
    hits = total = 0
    for qi in range(5):
        got = set(ap.get(qi, []))
        want = ex[qi]
        hits += sum(1 for v in want if v in got)
        total += len(want)
        assert ap[qi][0] == qi  # exact rerank: the query vector wins
    assert hits / total >= 0.8
    # exact-rerank output column is the true cosine
    assert "cosine" in a1.column_names
