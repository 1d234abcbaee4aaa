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
