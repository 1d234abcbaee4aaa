"""Percolation semantics (functions/percolate.py) — the oracle gate proves
value parity; these pin the conjunctive contract and edge cases."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from vexor_ray.functions.percolate import percolate_table


def _corpus(tmp_path, rows):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(rows))), type=pa.int64()),
                "text": pa.array(rows),
            }
        ),
        tmp_path / "documents.parquet",
    )
    return str(tmp_path)


def test_conjunctive_and_duplicates(ray_session, tmp_path):
    sf = _corpus(
        tmp_path,
        [
            "alpha beta gamma",      # matches q0, q1
            "alpha alpha",           # q0 only (beta missing)
            "beta gamma delta",      # neither (alpha missing)
        ],
    )
    t = percolate_table(sf, [(0, "alpha"), (1, "alpha beta"), (1, "")])
    pairs = list(
        zip(t.column("doc_id").to_pylist(), t.column("query_id").to_pylist())
    )
    assert pairs == [(0, 0), (0, 1), (1, 0)]


def test_empty_query_and_no_match(ray_session, tmp_path):
    sf = _corpus(tmp_path, ["alpha beta"])
    # CJK-only query tokenizes to nothing -> matches nothing (twin drops
    # its VALUES rows identically); absent term matches nothing
    t = percolate_table(sf, [(7, "中文"), (8, "zzqqx")])
    assert t.num_rows == 0


def test_indexed_path_matches_broadcast(ray_session, tmp_path):
    """The inverted-query-index arm (10^5-stored-queries shape) must emit
    the exact same (doc_id, query_id) set as the broadcast loop."""
    import random

    import ray.data

    from vexor_ray.functions.percolate import percolate

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        " ".join(rng.choices(vocab, k=rng.randint(3, 12))) for _ in range(200)
    ]
    sf = _corpus(tmp_path, docs)
    queries = [
        (i, " ".join(rng.sample(vocab, rng.randint(1, 3)))) for i in range(150)
    ]
    queries.append((150, ""))  # empty query dropped on both arms
    ds = ray.data.read_parquet(f"{sf}/documents.parquet")

    def pairs(threshold):
        out = percolate(ds, queries, indexed_threshold=threshold).to_pandas()
        return sorted(zip(out["doc_id"], out["query_id"]))

    bcast = pairs(10**9)  # force the broadcast loop
    indexed = pairs(0)  # force the query index
    assert len(bcast) > 0
    assert bcast == indexed
