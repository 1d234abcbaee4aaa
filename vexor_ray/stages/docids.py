"""Deterministic dense docID assignment (distributed zip-with-index).

``doc_id`` = rank of ``url`` in ascending url order over surviving docs —
deterministic under any parallelism, collision-free, and it gives the
(score desc, docID asc) tie-break a stable, explainable meaning (the oracle
computes the identical ranks with a plain sort).

Implementation: one global range-partitioned ``Dataset.sort("url")`` (the
single unavoidable all-to-all of the build), then a prefix-sum of per-block
row counts assigns each sorted block its docID offset.  Counting runs as
tiny Ray tasks against the already-materialized sorted blocks (zero-copy
reads from the object store), so no block is shipped to the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


@ray.remote(num_cpus=0)
def _block_rows(block: pa.Table) -> int:
    return block.num_rows


@ray.remote
def _with_ids(block: pa.Table, offset: int, id_col: str) -> pa.Table:
    ids = pa.array(
        np.arange(offset, offset + block.num_rows, dtype=np.uint64),
        type=pa.uint64(),
    )
    return block.add_column(0, id_col, ids)


def assign_doc_ids(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    """Sort by url and add a dense uint64 ``doc_id`` column (url rank)."""
    sorted_ds = ds.sort("url")
    refs = sorted_ds.to_arrow_refs()
    counts = ray.get([_block_rows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    out_refs = [
        _with_ids.remote(r, int(off), id_col) for r, off in zip(refs, offsets)
    ]
    return ray.data.from_arrow_refs(out_refs)
