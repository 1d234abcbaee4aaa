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


class TestCheckpointedIterations:
    def _graph(self, ray_session):
        import ray

        n = 40
        edges = [(i, (i * 3 + 1) % n) for i in range(0, n, 2)]
        edges += [(7, 8), (7, 9)]
        docs = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(range(n), type=pa.int64())})
        )
        eds = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([s for s, _ in edges], type=pa.int64()),
                    "dst": pa.array([d for _, d in edges], type=pa.int64()),
                }
            )
        )
        return docs, eds

    def test_unknown_edge_sources_are_dropped(self, ray_session):
        """pagerank_edges is public API over arbitrary (src, dst) rows: an
        edge whose src is absent from the node table must contribute
        nothing — not crash or read a neighbour's rank."""
        import ray

        from vexor_ray.functions.graph import pagerank_edges

        docs, eds = self._graph(ray_session)
        clean = (
            pagerank_edges(docs, eds, iters=3, n_parts=8)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # add edges from phantom nodes (one past the end, one far out)
        extra = pa.table(
            {
                "src": pa.array([40, 10_000], type=pa.int64()),
                "dst": pa.array([0, 1], type=pa.int64()),
            }
        )
        eds2 = eds.union(ray.data.from_arrow(extra))
        got = (
            pagerank_edges(docs, eds2, iters=3, n_parts=8)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["rank"].tolist() == clean["rank"].tolist()

    def test_checkpoint_equals_plain_and_resumes(self, ray_session, tmp_path):
        from vexor_ray.functions.graph import pagerank_edges

        docs, eds = self._graph(ray_session)
        plain = (
            pagerank_edges(docs, eds, iters=4, n_parts=8)
            .to_pandas()
            .sort_values("doc_id")
        )
        ck = tmp_path / "pr_ck"
        # first run: only 2 iterations committed
        pagerank_edges(docs, eds, iters=2, n_parts=8, checkpoint=str(ck))
        assert (ck / "iter-0001.json").exists()
        # resume to 4: iterations 0-1 read back, 2-3 computed
        got = (
            pagerank_edges(docs, eds, iters=4, n_parts=8, checkpoint=str(ck))
            .to_pandas()
            .sort_values("doc_id")
        )
        assert got["rank"].tolist() == plain["rank"].tolist()
        assert (ck / "iter-0003.json").exists()

    def test_crashed_iteration_recomputed(self, ray_session, tmp_path):
        from vexor_ray.functions.graph import pagerank_edges

        docs, eds = self._graph(ray_session)
        ck = tmp_path / "pr_crash"
        pagerank_edges(docs, eds, iters=3, n_parts=8, checkpoint=str(ck))
        plain = (
            pagerank_edges(docs, eds, iters=3, n_parts=8)
            .to_pandas()
            .sort_values("doc_id")
        )
        # simulate a crash mid-iteration-2: marker gone, partial shards left
        (ck / "iter-0002.json").unlink()
        for f in list((ck / "iter-0002").glob("*.parquet"))[1:]:
            f.unlink()
        got = (
            pagerank_edges(docs, eds, iters=3, n_parts=8, checkpoint=str(ck))
            .to_pandas()
            .sort_values("doc_id")
        )
        assert got["rank"].tolist() == plain["rank"].tolist()
