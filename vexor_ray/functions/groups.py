"""Coarse-partitioned exact group operations.

Ray Data's ``groupby().aggregate()`` and ``groupby().map_groups`` invoke
Python once per DISTINCT group (measured: ~0.4 ms/group → 113 s for a
250k-group Count on one block, 349 s for a 76k-bucket ``map_groups``), so
any grouped operation whose key cardinality grows with the corpus must not
hand Ray the real key.  The pattern here:

1. hash the key column(s) into ``n_parts`` coarse partitions with a
   process-stable hash (``pid`` column) — P ≈ cluster parallelism, NOT
   cardinality;
2. ``groupby("pid").map_groups`` so Ray co-locates each coarse partition
   (one shuffle, exactly P per-group Python calls);
3. run the real grouped computation inside the partition with pandas /
   numpy C kernels (a pandas groupby handles 250k groups in ~50 ms).

Exact semantics — every row of a key lands in one partition — with
per-group Python cost O(P) instead of O(cardinality).  All hashes are
process-stable (no builtin ``hash``; see ``vexor_ray.hashing``).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

DEFAULT_PARTS = 64

_MIX = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)


def mix_int_columns(*cols: np.ndarray) -> np.ndarray:
    """Deterministic uint64 avalanche mix of one or more integer columns."""
    h = np.zeros(len(cols[0]), dtype=np.uint64)
    for c in cols:
        h ^= c.astype(np.uint64) * _MIX
        h ^= h >> np.uint64(29)
        h *= _MIX2
        h ^= h >> np.uint64(32)
    return h


def int_pid(batch: pa.Table, key_cols: list[str], n_parts: int) -> pa.Table:
    """Append a ``pid`` column from integer key columns."""
    h = mix_int_columns(
        *(batch.column(c).to_numpy(zero_copy_only=False) for c in key_cols)
    )
    return batch.append_column(
        "pid", pa.array((h % np.uint64(n_parts)).astype(np.int64))
    )


def str_pid(batch: pa.Table, key_col: str, n_parts: int) -> pa.Table:
    """Append a ``pid`` column from a string key column (vectorized,
    dictionary-encoded siphash — process-stable)."""
    from ..hashing import hash_terms_arrow

    h = hash_terms_arrow(batch.column(key_col))
    return batch.append_column(
        "pid", pa.array((h % np.uint64(n_parts)).astype(np.int64))
    )


def coarse_grouped(
    ds: ray.data.Dataset,
    add_pid: Callable[[pa.Table], pa.Table],
    fn_df: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    n_parts: int = DEFAULT_PARTS,  # noqa: ARG001 - documented contract knob
) -> ray.data.Dataset:
    """Apply ``fn_df`` to every coarse partition of ``ds``.

    ``add_pid`` must append a ``pid`` column such that all rows of one real
    key share a pid; ``fn_df`` receives a partition as a pandas DataFrame
    (``pid`` already dropped) and must compute its grouped result with
    vectorized kernels — its output must not depend on which other keys
    share the partition.
    """
    tagged = ds.map_batches(add_pid, batch_format="pyarrow", zero_copy_batch=True)

    def run(group: pd.DataFrame) -> pd.DataFrame:
        return fn_df(group.drop(columns=["pid"]))

    return tagged.groupby("pid").map_groups(run, batch_format="pandas")


def compact_blocks(
    ds: ray.data.Dataset, rows_per_block: int = 65536
) -> ray.data.Dataset:
    """Coalesce a MATERIALIZED dataset whose blocks are much smaller than
    ``rows_per_block`` (split/merge repartition — no shuffle).

    Map/extract stages inherit the block count of their (wide) input, so a
    small derived table — an edge list, a rank vector — can land in dozens
    of near-empty blocks; every later union/sort/iteration then pays
    per-block overhead on air.  Count and block count are metadata-free on
    a materialized dataset, so the check costs nothing; datasets already at
    a sane rows/block ratio are returned unchanged (no-op at scale, where
    blocks are full)."""
    try:
        n_blocks = ds.num_blocks()
        n_rows = ds.count()
    except Exception:
        return ds
    if not n_blocks or n_blocks <= 1:
        return ds
    target = max(1, min(n_blocks, -(-n_rows // rows_per_block)))
    if target >= n_blocks:
        return ds
    return ds.repartition(target).materialize()


def dedup_int_pairs(
    ds: ray.data.Dataset,
    key_cols: list[str],
    *,
    n_parts: int = DEFAULT_PARTS,
    agg: dict[str, tuple[str, str]] | None = None,
) -> ray.data.Dataset:
    """Exact distinct (or per-key aggregate) over integer key columns.

    ``agg``: optional ``{out_col: (in_col, "min"|"max"|...)}`` pandas named
    aggregations applied per key; with ``None`` the result is the distinct
    key rows.
    """

    def add_pid(batch: pa.Table) -> pa.Table:
        return int_pid(batch, key_cols, n_parts)

    if agg is None:

        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return df.drop_duplicates(key_cols)[key_cols]

    else:

        def fn(df: pd.DataFrame) -> pd.DataFrame:
            named = {o: pd.NamedAgg(column=c, aggfunc=a) for o, (c, a) in agg.items()}
            return df.groupby(key_cols, as_index=False).agg(**named)

    return coarse_grouped(ds, add_pid, fn, n_parts=n_parts)
