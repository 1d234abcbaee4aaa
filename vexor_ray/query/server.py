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
    def __init__(self, index_dir: str, warm_terms: int = 64):
        self.searcher = Searcher(index_dir)
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
    """Round-robin pool of ``QueryWorker`` actors over one index."""

    def __init__(self, index_dir: str, num_workers: int = 4, warm_terms: int = 64):
        self.workers = [
            QueryWorker.remote(str(index_dir), warm_terms)
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
