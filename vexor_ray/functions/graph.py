"""Distributed PageRank over a hash-derived deterministic link graph.

The webtext workload this engine targets (Common-Crawl-style pages) feeds
static document priors — PageRank being the canonical one — into ranked
retrieval (see ``Searcher`` boosted search / ``boosted_topk``).  This module
implements the iterative computation Ray-Data-first:

- **Link graph**: the sandbox corpus carries no real hyperlinks, so edges
  are *derived deterministically* from the document ids — page ``i`` links
  to ``md5_u64(f"pr|{i}|{j}") % N`` for ``j < out_degree``.  Both the Ray
  engine and the DuckDB oracle regenerate the identical edge set from the
  same table (``md5_number_lower`` is the SQL twin of :func:`md5_u64`), so
  the whole iteration is value-checkable end to end.  On a real crawl the
  edge generator is replaced by an href-extraction ``map_batches`` stage;
  everything downstream is unchanged.
- **Fixed-point integer arithmetic** makes the float-free iteration
  order-independent: ranks live on a ``2**-58`` grid (``SCALE``), the
  damping factor is the rational ``17/20``, and every step is integer
  floor division — so distributed partial sums, pandas group sums and SQL
  ``SUM`` all agree bit-for-bit.  Overflow-safe: ``17 * sum <= 17 * SCALE
  < 2**63``.
- **Two coarse shuffles per iteration** (the honest PageRank cost):
  (1) co-partition ranks and edges by *source* id — per partition a
  ``searchsorted`` maps each edge to its source's rank and emits the
  integer contribution ``rank // out_degree``, plus one zero-contribution
  "seed" row per node so sink nodes keep a row; (2) re-partition the
  contributions by *destination* and sum per node (groups whose rows are
  all edge contributions with no seed are dropped — the LEFT-JOIN
  semantics of the SQL twin, which also makes non-dense id spaces safe).
  Group keys are corpus-cardinality, so both steps use the
  coarse-partition discipline (``functions/groups.py``) — P partition
  group calls, C-kernel group sums inside.
- **Per-iteration materialization** bounds the lineage: the rank state is
  16 bytes/doc (16 TB at 10^12 docs — object-store spill territory; a
  production run would checkpoint each iteration to parquet exactly like
  ``index/build.py`` waves, which also makes the iteration resumable).

Edges are REGENERATED from the documents read each iteration (a cheap
hash map) instead of materializing the 4N-row edge table across all
iterations — recompute beats pinning ~64 TB at target scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .dedup import md5_u64
from .groups import coarse_grouped, int_pid

SCALE = 1 << 58  # rank grid: integer units of 2**-58
DAMP_NUM, DAMP_DEN = 17, 20  # damping 0.85 as an exact rational


def _edges_batch_fn(n_docs: int, out_degree: int):
    def edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        src = np.repeat(ids, out_degree).astype(np.int64)
        dst = np.fromiter(
            (
                md5_u64(f"pr|{i}|{j}".encode()) % n_docs
                for i in ids
                for j in range(out_degree)
            ),
            dtype=np.int64,
            count=ids.size * out_degree,
        )
        return pa.table({"src": src, "dst": dst})

    return edges


def pagerank(
    sf_dir: str,
    iters: int = 5,
    out_degree: int = 4,
    n_parts: int = 64,
) -> ray.data.Dataset:
    """Iterative PageRank → Dataset (doc_id:int64, rank:int64).

    ``rank`` is the fixed-point value in units of ``2**-58``; ranks of all
    nodes sum to at most ``SCALE`` (floor divisions shed mass, never add).
    """
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    n = docs.count()
    base = DAMP_DEN - DAMP_NUM  # (1-d) numerator: 3
    teleport = base * SCALE // (DAMP_DEN * n)
    r0 = SCALE // n
    edges_fn = _edges_batch_fn(n, out_degree)

    ranks = docs.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("doc_id"),
                "rank": pa.array(
                    np.full(b.num_rows, r0, dtype=np.int64), type=pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    for _ in range(iters):
        # tag-union: rank rows (flag 0) carry (key=doc_id, rank);
        # edge rows (flag 1) carry (key=src, dst).  int64 fillers, not
        # nulls — pandas nulls would force float columns.
        def tag_rank(b: pa.Table) -> pa.Table:
            m = b.num_rows
            return pa.table(
                {
                    "key": b.column("doc_id"),
                    "rank": b.column("rank"),
                    "dst": pa.array(np.full(m, -1, dtype=np.int64)),
                    "flag": pa.array(np.zeros(m, dtype=np.int8)),
                }
            )

        def tag_edge(b: pa.Table) -> pa.Table:
            e = edges_fn(b)
            m = e.num_rows
            return pa.table(
                {
                    "key": e.column("src"),
                    "rank": pa.array(np.zeros(m, dtype=np.int64)),
                    "dst": e.column("dst"),
                    "flag": pa.array(np.ones(m, dtype=np.int8)),
                }
            )

        tagged = ranks.map_batches(
            tag_rank, batch_format="pyarrow", zero_copy_batch=True
        ).union(
            docs.map_batches(
                tag_edge, batch_format="pyarrow", zero_copy_batch=True
            )
        )

        def contrib_part(df: pd.DataFrame) -> pd.DataFrame:
            is_rank = df["flag"].to_numpy() == 0
            keys = df["key"].to_numpy()
            rk_keys = keys[is_rank]
            order = np.argsort(rk_keys, kind="stable")
            rk_keys = rk_keys[order]
            rk_vals = df["rank"].to_numpy()[is_rank][order]
            ed_src = keys[~is_rank]
            pos = np.searchsorted(rk_keys, ed_src)
            contrib = rk_vals[pos] // out_degree
            return pd.DataFrame(
                {
                    "dst": np.concatenate(
                        [df["dst"].to_numpy()[~is_rank], rk_keys]
                    ),
                    "contrib": np.concatenate(
                        [contrib, np.zeros(rk_keys.size, dtype=np.int64)]
                    ),
                    "seed": np.concatenate(
                        [
                            np.zeros(ed_src.size, dtype=np.int8),
                            np.ones(rk_keys.size, dtype=np.int8),
                        ]
                    ),
                }
            )

        stage1 = coarse_grouped(
            tagged, lambda b: int_pid(b, ["key"], n_parts), contrib_part
        )

        def sum_part(df: pd.DataFrame) -> pd.DataFrame:
            g = (
                df.groupby("dst", sort=False)
                .agg(s=("contrib", "sum"), seeded=("seed", "max"))
                .reset_index()
            )
            g = g[g["seeded"] == 1]
            s = g["s"].to_numpy().astype(np.int64)
            return pd.DataFrame(
                {
                    "doc_id": g["dst"].to_numpy().astype(np.int64),
                    "rank": teleport + (DAMP_NUM * s) // DAMP_DEN,
                }
            )

        ranks = coarse_grouped(
            stage1, lambda b: int_pid(b, ["dst"], n_parts), sum_part
        ).materialize()

    return ranks


def pagerank_topk(sf_dir: str, k: int = 100, iters: int = 5) -> pa.Table:
    """Top-k documents by PageRank → (doc_id, rank), rank desc / id asc.

    ``(rank, doc_id)`` is a total order, so per-block partial top-k followed
    by a driver cut over ≤ blocks×k rows is exact without tie widening.
    """
    ranks = pagerank(sf_dir, iters=iters)

    def block_topk(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        rk = b.column("rank").to_numpy()
        order = np.lexsort((ids, -rk))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], type=pa.int64()),
                "rank": pa.array(rk[order], type=pa.int64()),
            }
        )

    parts = ranks.map_batches(
        block_topk, batch_format="pyarrow", zero_copy_batch=True
    ).to_arrow_refs()
    tables = [t for t in (ray.get(r) for r in parts) if t.num_rows]
    if not tables:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64()),
            }
        )
    tbl = pa.concat_tables(tables)
    ids = tbl.column("doc_id").to_numpy()
    rk = tbl.column("rank").to_numpy()
    order = np.lexsort((ids, -rk))[:k]
    return pa.table(
        {
            "doc_id": pa.array(ids[order], type=pa.int64()),
            "rank": pa.array(rk[order], type=pa.int64()),
        }
    )
