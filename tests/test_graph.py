"""PageRank over the hash-derived link graph (vexor_ray/functions/graph.py).

The distributed two-shuffle iteration must be BIT-equal to a dense
single-machine reference doing the same fixed-point integer arithmetic —
that is the whole point of the 2^-58 grid + 17/20 rational damping (any
summation order gives the same integers).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from vexor_ray.functions.dedup import md5_u64
from vexor_ray.functions.graph import (
    DAMP_DEN,
    DAMP_NUM,
    SCALE,
    pagerank,
    pagerank_topk,
)

SF = "/root/testdata/sf0.001"
N_DOCS = 500
D = 4


def _dense_reference(iters: int) -> np.ndarray:
    """Single-machine fixed-point PageRank, same integer ops."""
    dst = np.fromiter(
        (
            md5_u64(f"pr|{i}|{j}".encode()) % N_DOCS
            for i in range(N_DOCS)
            for j in range(D)
        ),
        dtype=np.int64,
        count=N_DOCS * D,
    )
    src = np.repeat(np.arange(N_DOCS, dtype=np.int64), D)
    teleport = (DAMP_DEN - DAMP_NUM) * SCALE // (DAMP_DEN * N_DOCS)
    r = np.full(N_DOCS, SCALE // N_DOCS, dtype=np.int64)
    for _ in range(iters):
        contrib = r[src] // D
        s = np.zeros(N_DOCS, dtype=np.int64)
        np.add.at(s, dst, contrib)
        r = teleport + (DAMP_NUM * s) // DAMP_DEN
    return r


def test_pagerank_bit_equal_to_dense_reference(ray_session):
    want = _dense_reference(iters=3)
    got = (
        pagerank(SF, iters=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].to_numpy().tolist() == list(range(N_DOCS))
    assert np.array_equal(got["rank"].to_numpy(), want)


def test_pagerank_mass_and_positivity(ray_session):
    ranks = pagerank(SF, iters=2).to_pandas()["rank"].to_numpy()
    assert ranks.size == N_DOCS
    assert (ranks > 0).all()
    # floor divisions only shed mass; teleport re-injects at most (1-d)
    assert ranks.sum() <= SCALE


def test_pagerank_topk_is_total_order_cut(ray_session):
    full = _dense_reference(iters=5)
    order = np.lexsort((np.arange(N_DOCS), -full))[:25]
    got = pagerank_topk(SF, k=25, iters=5)
    assert got.num_rows == 25
    assert got.column("doc_id").to_numpy().tolist() == order.tolist()
    assert np.array_equal(got.column("rank").to_numpy(), full[order])
    assert got.schema == pa.schema(
        [("doc_id", pa.int64()), ("rank", pa.int64())]
    )
