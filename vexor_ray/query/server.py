"""Distributed query serving: an actor pool of warm Searchers.

Each actor holds a ``Searcher`` (manifest, pyarrow datasets, term-chunk
cache) built once in ``__init__``; query batches round-robin across the
pool.  This is the scale path for query THROUGHPUT (latency is already
served by the driver-side ``Searcher``): on a real cluster the actors land
on different nodes, each reading only the pruned row groups its terms live
in — no index broadcast, no per-query setup.
"""

from __future__ import annotations

import ray

from .searcher import Searcher


@ray.remote
class QueryWorker:
    def __init__(
        self,
        index_dir: str,
        warm_terms: int = 64,
        manifest_name: str | None = None,
    ):
        # manifest_name pins a retained snapshot: every worker in the pool
        # serves the SAME committed manifest even while builds/compactions
        # advance CURRENT underneath (deploy-time consistency)
        self.searcher = Searcher(index_dir, manifest_name=manifest_name)
        if warm_terms:
            # move the cold first-decode tail of hot (stop-word-class)
            # terms to actor startup — steady-state latency from query one
            self.searcher.warm_hot_terms(warm_terms)

    def search_batch(
        self, queries: list[dict], method: str = "auto"
    ) -> list[list[tuple[int, float]]]:
        return [
            self.searcher.search(q["query"], q.get("k", 10), method=method)
            for q in queries
        ]


class QueryPool:
    """Round-robin pool of ``QueryWorker`` actors over one index.

    ``manifest_name`` (from ``index.manifest.list_manifests``) pins every
    worker to one retained snapshot — the deployment story's consistency
    anchor (see README "Deploying the query tier")."""

    def __init__(
        self,
        index_dir: str,
        num_workers: int = 4,
        warm_terms: int = 64,
        manifest_name: str | None = None,
    ):
        self.workers = [
            QueryWorker.remote(str(index_dir), warm_terms, manifest_name)
            for _ in range(num_workers)
        ]

    def search_many(
        self, queries: list[dict], method: str = "auto", batch_size: int = 8
    ) -> list[list[tuple[int, float]]]:
        """Run a query set across the pool; results in input order."""
        futures = []
        spans = []
        for i in range(0, len(queries), batch_size):
            batch = queries[i : i + batch_size]
            worker = self.workers[(i // batch_size) % len(self.workers)]
            futures.append(worker.search_batch.remote(batch, method))
            spans.append((i, len(batch)))
        out: list = [None] * len(queries)
        results = ray.get(futures)
        for (start, n), res in zip(spans, results):
            out[start : start + n] = res
        return out

    def shutdown(self) -> None:
        for w in self.workers:
            ray.kill(w)
        self.workers = []


def search_dataset(
    queries,
    index_dir: str,
    k: int = 10,
    *,
    method: str = "auto",
    concurrency: int = 4,
    rounded: bool = False,
    filesystem=None,
):
    """Bulk retrieval as a Ray Data stage: queries stream through a warm
    Searcher actor pool and come out as a flat hits dataset.

    Input rows: ``(query_id, query[, k])``; output rows:
    ``(query_id, rank, doc_id, score)``.  This is retrieval composed INTO
    a pipeline (eval harnesses, decontamination-by-search, mining hard
    negatives over a 100 TB corpus): the query set itself can be
    arbitrarily large — it streams with backpressure, each actor holding
    one warm Searcher (pruned reads + decoded-postings cache) built once.

    ``rounded=True`` ranks by (6-decimal-rounded score desc, docID asc) —
    the cross-engine-stable contract the SQL twins use (it scores the full
    match set per query; the default exact top-k path does not).
    """
    import pyarrow as pa

    class BulkSearch:
        def __init__(self):
            self.s = Searcher(index_dir, filesystem=filesystem)
            self.s.warm_hot_terms(64)

        def __call__(self, batch: pa.Table) -> pa.Table:
            qids_out, ranks, docs, scores = [], [], [], []
            kcol = (
                batch.column("k").to_pylist()
                if "k" in batch.schema.names
                else [k] * batch.num_rows
            )
            for qid, qtext, kq in zip(
                batch.column("query_id").to_pylist(),
                batch.column("query").to_pylist(),
                kcol,
            ):
                if rounded:
                    res = self.s.search(
                        qtext, k=self.s.live_doc_count, method=method
                    )
                    pairs = [(int(d), round(float(x), 6)) for d, x in res]
                    pairs.sort(key=lambda p: (-p[1], p[0]))
                    res = pairs[:kq]
                else:
                    res = self.s.search(qtext, k=kq, method=method)
                for r, (d, sc) in enumerate(res, start=1):
                    qids_out.append(qid)
                    ranks.append(r)
                    docs.append(int(d))
                    scores.append(float(sc))
            return pa.table(
                {
                    "query_id": pa.array(qids_out, type=pa.int64()),
                    "rank": pa.array(ranks, type=pa.int32()),
                    "doc_id": pa.array(docs, type=pa.uint64()),
                    "score": pa.array(scores, type=pa.float64()),
                }
            )

    # clamp the pool below the session CPU count: a pool reserving every
    # CPU starves an upstream read stage of the same pipeline (deadlock in
    # small sessions; pre-materialized query buffers just masked it here)
    try:
        cpus = int(ray.cluster_resources().get("CPU", concurrency + 1))
    except Exception:
        cpus = concurrency + 1
    concurrency = max(1, min(concurrency, cpus - 1))
    return queries.map_batches(
        BulkSearch,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
        zero_copy_batch=True,
    )
