"""Actor-pool query server: identical results, parallel execution."""

from __future__ import annotations

from vexor_ray.fixtures.pages import generate_queries
from vexor_ray.query.searcher import Searcher
from vexor_ray.query.server import QueryPool


def test_query_pool_matches_driver_searcher(built_index):
    out, _ = built_index
    s = Searcher(out)
    queries = generate_queries(30, seed=42)
    pool = QueryPool(out, num_workers=2)
    try:
        pooled = pool.search_many(queries, method="auto", batch_size=5)
    finally:
        pool.shutdown()
    for q, res in zip(queries, pooled):
        assert res == s.search(q["query"], q["k"], method="auto"), q
