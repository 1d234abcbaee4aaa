"""Distributed PageRank over document link graphs.

The webtext workload this engine targets (Common-Crawl-style pages) feeds
static document priors — PageRank being the canonical one — into ranked
retrieval (see ``Searcher`` boosted search / ``boosted_topk``).  This module
implements the iterative computation Ray-Data-first:

- **Link graph**: two sources.  :func:`pagerank` derives edges
  *deterministically from document ids* (page ``i`` links to
  ``md5_u64(f"pr|{i}|{j}") % N`` for ``j < out_degree``) — the sandbox
  corpus carries no real hyperlinks, and both the Ray engine and the DuckDB
  oracle regenerate the identical edge set from the same table
  (``md5_number_lower`` is the SQL twin of :func:`md5_u64`), so the whole
  iteration is value-checkable end to end.  :func:`pagerank_edges` takes a
  REAL materialized edge dataset — e.g. the href-extraction stage
  (``stages/html.py::extract_links_stage`` → ``resolve_links``) — with
  *variable out-degree computed from the edges themselves*, closing the
  loop the hash-derived variant documents ("on a real crawl the edge
  generator is replaced by an href-extraction map_batches stage").
- **Fixed-point integer arithmetic** makes the float-free iteration
  order-independent: ranks live on a ``2**-58`` grid (``SCALE``), the
  damping factor is the rational ``17/20``, and every step is integer
  floor division — so distributed partial sums, pandas group sums and SQL
  ``SUM`` all agree bit-for-bit.  Overflow-safe: ``17 * sum <= 17 * SCALE
  < 2**63``.
- **Two coarse shuffles per iteration** (the honest PageRank cost):
  (1) co-partition ranks and edges by *source* id — per partition a
  ``searchsorted`` maps each edge to its source's rank and emits the
  integer contribution ``rank // out_degree(src)`` (out-degree counted
  inside the partition: all edges of one src share it by construction),
  plus one zero-contribution "seed" row per node so sink nodes keep a row;
  (2) re-partition the contributions by *destination* and sum per node
  (groups whose rows are all edge contributions with no seed are dropped —
  the LEFT-JOIN semantics of the SQL twin, which also makes non-dense id
  spaces safe).  Dangling pages (no out-links) shed their mass — the same
  simplification the twin's inner join over edges encodes.  Group keys are
  corpus-cardinality, so both steps use the coarse-partition discipline
  (``functions/groups.py``) — P partition group calls, C-kernel group sums
  inside.
- **Per-iteration materialization** bounds the lineage: the rank state is
  16 bytes/doc (16 TB at 10^12 docs — object-store spill territory; a
  production run would checkpoint each iteration to parquet exactly like
  ``index/build.py`` waves, which also makes the iteration resumable).

Hash-derived edges are REGENERATED from the documents read each iteration
(a cheap hash map) instead of materializing the 4N-row edge table across
all iterations — recompute beats pinning ~64 TB at target scale.
Extracted edges are the opposite trade: href extraction re-parses the wide
html column, so :func:`pagerank_edges` takes the edge table materialized
ONCE (12 TB at 10^12 docs × avg degree 4 — parquet-checkpoint territory,
not recompute).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
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


def _tag_rank(b: pa.Table) -> pa.Table:
    m = b.num_rows
    return pa.table(
        {
            "key": b.column("doc_id"),
            "rank": b.column("rank"),
            "dst": pa.array(np.full(m, -1, dtype=np.int64)),
            "flag": pa.array(np.zeros(m, dtype=np.int8)),
        }
    )


def _tag_edges_table(e: pa.Table) -> pa.Table:
    m = e.num_rows
    return pa.table(
        {
            "key": pc.cast(e.column("src"), pa.int64()),
            "rank": pa.array(np.zeros(m, dtype=np.int64)),
            "dst": pc.cast(e.column("dst"), pa.int64()),
            "flag": pa.array(np.ones(m, dtype=np.int8)),
        }
    )


def _iterate(
    ranks: ray.data.Dataset,
    tagged_edges: "callable",
    teleport: int,
    iters: int,
    n_parts: int,
    checkpoint=None,
) -> ray.data.Dataset:
    """The shared iteration loop.  ``tagged_edges()`` returns the tagged
    edge dataset for one iteration (regenerated or re-read — caller's
    materialization trade).

    ``checkpoint`` (a ``Store`` / URI / local path) makes each iteration
    RESUMABLE with the repo's pointer-commit discipline: rank shards are
    written to ``iter-{i:04d}/`` by parallel tasks, then a tiny
    ``iter-{i:04d}.json`` manifest commits the file list atomically — a
    completed iteration is skipped on rerun (read back from its shards,
    bit-identical by the integer grid), a crashed one leaves no marker and
    its partial directory is cleared and recomputed.  This is the
    build-wave checkpoint shape applied to iterative state, and it also
    bounds lineage (no 2×iters-deep dataset graph at 10^12 docs)."""

    def contrib_part(df: pd.DataFrame) -> pd.DataFrame:
        is_rank = df["flag"].to_numpy() == 0
        keys = df["key"].to_numpy()
        rk_keys = keys[is_rank]
        order = np.argsort(rk_keys, kind="stable")
        rk_keys = rk_keys[order]
        rk_vals = df["rank"].to_numpy()[is_rank][order]
        ed_src = keys[~is_rank]
        ed_dst = df["dst"].to_numpy()[~is_rank]
        if ed_src.size and rk_keys.size:
            # out-degree per edge, counted within the partition: every edge
            # of one src co-partitions here, so the count is global
            _, inv, cnt = np.unique(
                ed_src, return_inverse=True, return_counts=True
            )
            pos = np.searchsorted(rk_keys, ed_src)
            # pagerank_edges is public API over arbitrary (src, dst) rows:
            # an edge whose src has no node row must contribute nothing,
            # not index past rk_vals or read a neighbour's rank (the
            # resolve_links live-check pattern)
            pos = np.minimum(pos, rk_keys.size - 1)
            live = rk_keys[pos] == ed_src
            contrib = rk_vals[pos[live]] // cnt[inv[live]]
            ed_dst = ed_dst[live]
        else:
            contrib = np.array([], dtype=np.int64)
            ed_dst = ed_dst[:0]
        return pd.DataFrame(
            {
                "dst": np.concatenate([ed_dst, rk_keys]),
                "contrib": np.concatenate(
                    [contrib, np.zeros(rk_keys.size, dtype=np.int64)]
                ),
                "seed": np.concatenate(
                    [
                        np.zeros(ed_dst.size, dtype=np.int8),
                        np.ones(rk_keys.size, dtype=np.int8),
                    ]
                ),
            }
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

    def one_iteration(ranks: ray.data.Dataset) -> ray.data.Dataset:
        tagged = ranks.map_batches(
            _tag_rank, batch_format="pyarrow", zero_copy_batch=True
        ).union(tagged_edges())
        stage1 = coarse_grouped(
            tagged, lambda b: int_pid(b, ["key"], n_parts), contrib_part
        )
        return coarse_grouped(
            stage1, lambda b: int_pid(b, ["dst"], n_parts), sum_part
        )

    # Block-count discipline: union adds the edge-side blocks and the
    # sort-based groupby preserves input block count, so without coalescing
    # every iteration's rank dataset grows by ~edge_blocks blocks — cost per
    # iteration then climbs linearly (measured 1.7 → 6.5 s/iter over 5
    # iterations on a 500-row graph) and metadata bloats identically at
    # cluster scale.  Repartition (split/merge, no shuffle) back to the
    # incoming rank-block count keeps every iteration the same size.
    try:
        target_blocks = max(1, ranks.num_blocks())
    except Exception:
        target_blocks = n_parts
    store = None
    if checkpoint is not None:
        from ..index.storage import Store

        store = Store.resolve(checkpoint)
    for i in range(iters):
        if store is not None:
            marker = f"iter-{i:04d}.json"
            if store.exists(marker):
                ranks = ray.data.read_parquet(
                    store.read_json(marker)["files"], filesystem=store.fs
                )
                continue
            rel = f"iter-{i:04d}"
            if store.exists(rel):
                store.delete_dir(rel)  # partial dir from a crash: recompute
            store.mkdirs(rel)
            one_iteration(ranks).repartition(target_blocks).write_parquet(
                store.path(rel), filesystem=store.fs
            )
            files = store.list_files(rel, suffix=".parquet")
            store.write_json_atomic(marker, {"iter": i, "files": files})
            ranks = ray.data.read_parquet(files, filesystem=store.fs)
        else:
            ranks = one_iteration(ranks).repartition(target_blocks).materialize()
    return ranks


def _initial_ranks(docs: ray.data.Dataset, r0: int) -> ray.data.Dataset:
    from .groups import compact_blocks

    return compact_blocks(
        docs.map_batches(
            lambda b: pa.table(
                {
                    "doc_id": b.column("doc_id"),
                    "rank": pa.array(
                        np.full(b.num_rows, r0, dtype=np.int64),
                        type=pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
    )


def pagerank(
    sf_dir: str,
    iters: int = 5,
    out_degree: int = 4,
    n_parts: int = 64,
) -> ray.data.Dataset:
    """Iterative PageRank over the hash-derived graph → Dataset
    (doc_id:int64, rank:int64).

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

    def tagged_edges() -> ray.data.Dataset:
        return docs.map_batches(
            lambda b: _tag_edges_table(edges_fn(b)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    ranks = _initial_ranks(docs, r0)
    return _iterate(ranks, tagged_edges, teleport, iters, n_parts)


def pagerank_edges(
    docs: ray.data.Dataset,
    edges: ray.data.Dataset,
    iters: int = 5,
    n_parts: int = 64,
    checkpoint=None,
) -> ray.data.Dataset:
    """PageRank over a REAL edge dataset ``(src:int64, dst:int64)`` —
    variable out-degree, parallel edges carry mass per occurrence.

    ``docs`` is the node table ``(doc_id,)`` (every crawled page gets
    teleport mass even with no in/out links); ``edges`` should be
    materialized by the caller (href extraction is too expensive to
    regenerate per iteration — the opposite trade from the hash graph).
    """
    n = docs.count()
    base = DAMP_DEN - DAMP_NUM
    teleport = base * SCALE // (DAMP_DEN * n)
    ranks = _initial_ranks(docs, SCALE // n)

    def tagged_edges() -> ray.data.Dataset:
        return edges.map_batches(
            _tag_edges_table, batch_format="pyarrow", zero_copy_batch=True
        )

    return _iterate(
        ranks, tagged_edges, teleport, iters, n_parts, checkpoint=checkpoint
    )


def _ranks_topk(ranks: ray.data.Dataset, k: int) -> pa.Table:
    """Top-k by (rank desc, doc_id asc) — a total order, so per-block
    partial top-k + a driver cut over ≤ blocks×k rows is exact."""

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


def pagerank_topk(sf_dir: str, k: int = 100, iters: int = 5) -> pa.Table:
    """Top-k documents by hash-graph PageRank → (doc_id, rank)."""
    return _ranks_topk(pagerank(sf_dir, iters=iters), k)


def crawl_frontier(
    edges: ray.data.Dataset,
    seeds: list[int],
    max_depth: int = 3,
    n_parts: int = 64,
) -> ray.data.Dataset:
    """Crawl-frontier expansion: min discovery depth per page reachable
    from ``seeds`` within ``max_depth`` hops of the link graph — the
    BFS/scheduling primitive of a crawler ("what does the next fetch round
    reach?").

    Level-synchronous distributed BFS, two coarse exchanges per level
    (the PageRank discipline, block-coalesced): (1) co-partition edges
    with the current frontier by SOURCE id and emit each frontier node's
    out-neighbors (dedup inside the partition); (2) co-partition the
    candidates with the visited set by node id and keep only unseen nodes
    — they form the next frontier at depth d+1.  State is (doc_id, depth)
    datasets; nothing corpus-sized touches the driver.  Early-exits when
    a level adds nothing.
    """
    from .groups import coarse_grouped, compact_blocks, int_pid

    seed_ids = sorted(set(int(x) for x in seeds))
    best = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(seed_ids, type=pa.int64()),
                "depth": pa.array([0] * len(seed_ids), type=pa.int64()),
            }
        )
    ).materialize()
    frontier = best
    edges = compact_blocks(edges.materialize())

    def tag_edge(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b.column("src").cast(pa.int64()),
                "dst": b.column("dst").cast(pa.int64()),
                "flag": pa.array(
                    np.ones(b.num_rows, dtype=np.int8), type=pa.int8()
                ),
            }
        )

    def tag_node(col: str):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "key": b.column(col).cast(pa.int64()),
                    "dst": pa.array(
                        np.zeros(b.num_rows, dtype=np.int64), type=pa.int64()
                    ),
                    "flag": pa.array(
                        np.zeros(b.num_rows, dtype=np.int8), type=pa.int8()
                    ),
                }
            )

        return fn

    def expand_part(df: pd.DataFrame) -> pd.DataFrame:
        is_front = df["flag"].to_numpy() == 0
        front = set(df["key"].to_numpy()[is_front].tolist())
        if not front:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
        ed = df[~is_front]
        hit = ed[ed["key"].isin(front)]
        return pd.DataFrame({"doc_id": hit["dst"].unique()})

    def unseen_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("key")["flag"].min()
        fresh = g[g == 1].index.to_numpy()
        return pd.DataFrame({"doc_id": fresh})

    for depth in range(1, max_depth + 1):
        tagged = frontier.map_batches(
            tag_node("doc_id"), batch_format="pyarrow", zero_copy_batch=True
        ).union(
            edges.map_batches(
                tag_edge, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        cand = coarse_grouped(
            tagged, lambda b: int_pid(b, ["key"], n_parts), expand_part
        )

        def tag_cand(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "key": b.column("doc_id").cast(pa.int64()),
                    "flag": pa.array(
                        np.ones(b.num_rows, dtype=np.int8), type=pa.int8()
                    ),
                }
            )

        def tag_best(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "key": b.column("doc_id").cast(pa.int64()),
                    "flag": pa.array(
                        np.zeros(b.num_rows, dtype=np.int8), type=pa.int8()
                    ),
                }
            )

        merged = cand.map_batches(
            tag_cand, batch_format="pyarrow", zero_copy_batch=True
        ).union(
            best.map_batches(
                tag_best, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        fresh = coarse_grouped(
            merged, lambda b: int_pid(b, ["key"], n_parts), unseen_part
        )

        def with_depth(b: pa.Table, d=depth) -> pa.Table:
            return pa.table(
                {
                    "doc_id": b.column("doc_id").cast(pa.int64()),
                    "depth": pa.array(
                        np.full(b.num_rows, d, dtype=np.int64),
                        type=pa.int64(),
                    ),
                }
            )

        new_frontier = compact_blocks(
            fresh.map_batches(
                with_depth, batch_format="pyarrow", zero_copy_batch=True
            ).materialize()
        )
        if new_frontier.count() == 0:
            break
        best = compact_blocks(best.union(new_frontier).materialize())
        frontier = new_frontier
    return best
