"""Headline bench: index-build docs/sec + BM25 query p50/p99 (+ operator suite).

Prints ONE JSON line:
  {"metric": ..., "value": <headline seconds>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N}

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS (default 32).
``--scaling`` runs the headline build twice in fresh processes at 8 and 32
CPUs on the same input and reports both throughputs + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time
from pathlib import Path

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

_SF_TO_PAGES = {"sf0.001": 1_000, "sf0.01": 10_000, "sf0.1": 100_000}


def _sf_name() -> str:
    return Path(SF_DIR).name


def _pages_rows() -> int:
    return int(
        os.environ.get("VEXOR_BENCH_PAGES", _SF_TO_PAGES.get(_sf_name(), 100_000))
    )


def _pages_dir() -> Path:
    from vexor_ray.fixtures.pages import write_pages

    n = _pages_rows()
    return write_pages(f"/tmp/vx_bench_pages_{n}", n, seed=42, rows_per_file=max(n // 8, 1))


def _build_cfg(num_cpus: int):
    from vexor_ray.index.build import BuildConfig

    return BuildConfig(
        num_waves=2,
        partitions_per_wave=max(8, num_cpus),
        shard_group_size=8,
        tokenize_concurrency=max(2, min(24, num_cpus * 3 // 4)),
        tokenize_batch_size=512,
    )


def bench_build(pages: Path, num_cpus: int) -> dict:
    from vexor_ray.fixtures.pages import write_pages
    from vexor_ray.index.build import build_index

    cfg = _build_cfg(num_cpus)
    # untimed warmup: spin up Ray workers + actor pools + shuffle machinery
    # on a tiny corpus so the timed run measures steady-state throughput,
    # not fresh-process import costs
    warm_pages = write_pages("/tmp/vx_bench_warm_2000", 2000, seed=42,
                             rows_per_file=250)
    warm_idx = Path("/tmp/vx_bench_warm_idx")
    shutil.rmtree(warm_idx, ignore_errors=True)
    build_index(warm_pages, warm_idx, cfg)

    idx_dir = Path(f"/tmp/vx_bench_idx_{_pages_rows()}")
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.perf_counter()
    manifest = build_index(pages, idx_dir, cfg)
    wall = time.perf_counter() - t0
    docs = manifest["stats"]["doc_count"]
    stage_walls = {
        f"{p['stage']}:{p['partition_id']}": p["metrics"].get("wall_s")
        for p in manifest["partitions"]
    }
    return {
        "index_dir": str(idx_dir),
        "build_sec": round(wall, 3),
        "docs": docs,
        "docs_per_sec": round(docs / wall, 1),
        "stage_walls": stage_walls,
    }


def bench_queries(index_dir: str, n: int | None = None) -> dict:
    if n is None:
        n = int(os.environ.get("VEXOR_BENCH_QUERIES", "120"))
    from vexor_ray.fixtures.pages import generate_queries
    from vexor_ray.query.searcher import Searcher

    s = Searcher(index_dir)
    queries = generate_queries(n, seed=42)
    out = {}

    def one_pass(method: str) -> list[float]:
        lats = []
        for q in queries:
            t0 = time.perf_counter()
            s.search(q["query"], q["k"], method=method)
            lats.append(time.perf_counter() - t0)
        return sorted(lats)

    for method in ("exact", "wand", "auto"):
        # pass 1 = cold (first-touch parquet reads + posting decode); pass 2
        # = warm steady-state serving (chunk LRU + decoded hot-term cache) —
        # the serving-path number a query pool actually exhibits
        cold = one_pass(method)
        warm = one_pass(method)
        if method == "exact":
            out["query_cold_p50_ms"] = round(1000 * statistics.median(cold), 2)
            out["query_cold_p99_ms"] = round(
                1000 * cold[min(len(cold) - 1, int(0.99 * len(cold)))], 2
            )
        out[f"query_{method}_p50_ms"] = round(1000 * statistics.median(warm), 2)
        out[f"query_{method}_p99_ms"] = round(
            1000 * warm[min(len(warm) - 1, int(0.99 * len(warm)))], 2
        )
    # serving throughput: warm auto-routed queries back to back (the QPS a
    # single warm searcher process sustains; a pool scales it per actor)
    t0 = time.perf_counter()
    for q in queries:
        s.search(q["query"], q["k"], method="auto")
    wall = time.perf_counter() - t0
    out["query_qps_warm"] = round(len(queries) / wall, 1)
    return out


def bench_deletes(pages: Path, index_dir: str) -> dict:
    """Deletion lifecycle costs on the headline index: clone (replication
    throughput), delete commit, tombstone-masked warm query overhead, purge
    wall, post-purge warm latency.  Runs on a CLONE so the main index stays
    untouched for other arms."""
    import shutil
    import statistics as _st

    from vexor_ray.fixtures.pages import generate_queries
    from vexor_ray.index.clone import clone_index
    from vexor_ray.index.deletes import delete_docs, purge_deletes
    from vexor_ray.query.searcher import Searcher

    out: dict = {}
    work = Path("/tmp/vx_bench_delete_idx")
    shutil.rmtree(work, ignore_errors=True)
    t0 = time.perf_counter()
    stats = clone_index(index_dir, work)
    out["clone_sec"] = round(time.perf_counter() - t0, 3)
    out["clone_mb"] = round(stats["bytes_copied"] / 1e6, 1)

    s = Searcher(work)
    urls = s._docs_ds.to_table(columns=["url"]).column("url").to_pylist()
    victims = sorted(urls)[:: max(1, len(urls) // 100)][:1000]  # ~1%
    t0 = time.perf_counter()
    delete_docs(work, victims)
    out["delete_commit_sec"] = round(time.perf_counter() - t0, 3)

    queries = generate_queries(60, seed=42)

    def warm_p50(searcher) -> float:
        for q in queries:
            searcher.search(q["query"], q["k"])
        lats = []
        for q in queries:
            t = time.perf_counter()
            searcher.search(q["query"], q["k"])
            lats.append(time.perf_counter() - t)
        return round(1000 * _st.median(lats), 2)

    out["tombstone_query_p50_ms"] = warm_p50(Searcher(work))
    t0 = time.perf_counter()
    purge_deletes(pages, work)
    out["purge_sec"] = round(time.perf_counter() - t0, 3)
    out["post_purge_query_p50_ms"] = warm_p50(Searcher(work))
    shutil.rmtree(work, ignore_errors=True)
    return out


def bench_impact(pages: Path, num_cpus: int) -> dict:
    """Impact-ordered-layout arm: build the companion-layout index and
    measure COLD selective latency (rare needle + hot companion, fresh
    Searcher per query) for the TA scorer vs WAND on the same index."""
    import statistics

    from vexor_ray.index.build import build_index
    from vexor_ray.query.searcher import Searcher

    cfg = _build_cfg(num_cpus)
    cfg.impact_postings = True
    idx = Path(f"/tmp/vx_bench_impidx_{_pages_rows()}")
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.perf_counter()
    build_index(pages, idx, cfg)
    build_sec = round(time.perf_counter() - t0, 3)

    # 'body'/'title' wrap every synthetic page (df = corpus size); needles
    # have df 2/10/100 — the auto-routed cold-selective shape
    queries = [f"{r} body" for r in
               ("needledftwo", "needledften", "needledfhundred")]
    out = {"impact_build_sec": build_sec}
    for method in ("impact", "wand"):
        lats = []
        for q in queries:
            for _ in range(3):
                s = Searcher(idx)  # fresh caches: cold path
                t0 = time.perf_counter()
                s.search(q, 10, method=method)
                lats.append(time.perf_counter() - t0)
        out[f"{method}_cold_sel_p50_ms"] = round(
            1000 * statistics.median(lats), 2
        )
        out[f"{method}_cold_sel_max_ms"] = round(1000 * max(lats), 2)
    return out


def bench_operators() -> dict:
    """Secondary: representative operators over the driver sf tables."""
    import ray.data

    from vexor_ray.functions.ann import brute_force_topk
    from vexor_ray.functions.dedup import exact_duplicates
    from vexor_ray.pipelines.relational import agg_lineitem, sort_topk_orders

    out = {}

    t0 = time.perf_counter()
    agg_lineitem(SF_DIR)
    out["agg_lineitem"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    sort_topk_orders(SF_DIR)
    out["sort_topk_orders"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    exact_duplicates(docs).to_pandas()
    out["dedup_exact"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    import numpy as np
    import pyarrow.parquet as pq

    emb_tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    q = np.asarray(emb_tbl["embedding"].to_pylist()[:8], dtype=np.float64)
    emb = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    brute_force_topk(emb, q, k=10)
    out["knn_cosine"] = round(time.perf_counter() - t0, 3)

    from vexor_ray.functions.dedup import minhash_lsh_pairs
    from vexor_ray.pipelines.joins import asof_join_events_orders

    t0 = time.perf_counter()
    docs = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    minhash_lsh_pairs(docs, threshold=0.4).count()
    out["minhash_pairs"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    asof_join_events_orders(SF_DIR).count()
    out["asof_join"] = round(time.perf_counter() - t0, 3)

    from vexor_ray.functions.dedup import clean_corpus

    t0 = time.perf_counter()
    docs = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    clean_corpus(docs).count()
    out["clean_corpus"] = round(time.perf_counter() - t0, 3)

    from vexor_ray.functions.sketch import hll_distinct_tokens
    from vexor_ray.functions.textstats import bigram_counts, scrub
    from vexor_ray.pipelines.relational import events_session_agg, price_quantiles

    t0 = time.perf_counter()
    events_session_agg(SF_DIR)
    out["session_windows"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    price_quantiles(SF_DIR)
    out["exact_quantiles"] = round(time.perf_counter() - t0, 3)

    docs = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    t0 = time.perf_counter()
    bigram_counts(docs, min_count=5).count()
    out["bigram_counts"] = round(time.perf_counter() - t0, 3)

    docs = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    t0 = time.perf_counter()
    scrub(docs).count()
    out["pii_scrub"] = round(time.perf_counter() - t0, 3)

    docs = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    t0 = time.perf_counter()
    hll_distinct_tokens(docs)
    out["hll_distinct"] = round(time.perf_counter() - t0, 3)

    from vexor_ray.functions.dedup import substring_dup_stats
    from vexor_ray.pipelines.relational import pack_sequences

    docs = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    t0 = time.perf_counter()
    substring_dup_stats(docs, window=8).count()
    out["substring_dup"] = round(time.perf_counter() - t0, 3)

    docs = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    t0 = time.perf_counter()
    substring_dup_stats(docs, window=8, hasher="rolling").count()
    out["substring_dup_rolling"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    pack_sequences(SF_DIR).count()
    out["pack_sequences"] = round(time.perf_counter() - t0, 3)

    from vexor_ray.functions.sketch import lm_quality

    docs = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    t0 = time.perf_counter()
    lm_quality(docs).count()
    out["lm_quality"] = round(time.perf_counter() - t0, 3)

    from vexor_ray.functions.dedup import decontaminate

    docs = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    eval_docs = docs.limit(10)
    t0 = time.perf_counter()
    decontaminate(docs, eval_docs, window=8).count()
    out["decontaminate"] = round(time.perf_counter() - t0, 3)

    from vexor_ray.stages.codechunk import chunk_mode_pages

    code_pages = Path("/tmp/vx_bench_code_pages")
    if not code_pages.exists():
        import pyarrow as pa
        import pyarrow.parquet as _pq

        tbl = _pq.read_table(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
        )
        srcs, urls = [], []
        for did, text in zip(
            tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
        ):
            urls.append(f"doc_{did}.py")
            srcs.append(
                f'def fn_{did}():\n    """{(text or "")[:400]}"""\n'
                f"    return {did}\n\nclass C_{did}:\n    def m(self):\n"
                f"        pass\n"
            )
        code_pages.mkdir(parents=True, exist_ok=True)
        _pq.write_table(
            pa.table({"url": urls, "text": srcs}),
            code_pages / "part-0.parquet",
        )
    out_chunks = Path("/tmp/vx_bench_code_chunks")
    shutil.rmtree(out_chunks, ignore_errors=True)
    t0 = time.perf_counter()
    chunk_mode_pages(code_pages, out_chunks, mode="code")
    out["code_chunks"] = round(time.perf_counter() - t0, 3)

    from vexor_ray.functions.ann import pq_adc_topk, pq_encode, pq_train

    emb = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    t0 = time.perf_counter()
    books = pq_train(emb, m_subspaces=8, k_codes=64, iters=2)
    codes = pq_encode(emb, books)
    pq_adc_topk(codes, books, q, k=10, rerank_embeddings=emb, rerank_factor=10)
    out["pq_topk"] = round(time.perf_counter() - t0, 3)

    from vexor_ray.functions.ann import ivf_pq_topk

    t0 = time.perf_counter()
    ivf_pq_topk(emb, q, k=10, k_cells=16, nprobe=4, m_subspaces=8, k_codes=64)
    out["ivf_pq_topk"] = round(time.perf_counter() - t0, 3)

    from vexor_ray.pipelines.web import crawl_frontier_table

    t0 = time.perf_counter()
    crawl_frontier_table(SF_DIR, [0, 1, 2], max_depth=3)
    out["crawl_frontier"] = round(time.perf_counter() - t0, 3)

    import tempfile

    from vexor_ray.sinks import export_parquet_resumable

    exp_dir = tempfile.mkdtemp(prefix="vx_bench_export_")
    t0 = time.perf_counter()
    export_parquet_resumable(
        [f"{SF_DIR}/documents.parquet"], exp_dir, None,
        columns=["doc_id", "lang", "n_chars"], rows_per_shard=8192,
    )
    out["export_resumable"] = round(time.perf_counter() - t0, 3)
    shutil.rmtree(exp_dir, ignore_errors=True)

    # webtext arc: HTML extraction / link graph over rendered documents
    from vexor_ray.pipelines.web import (
        extract_links_table,
        html_text_table,
        pagerank_links_topk,
    )

    t0 = time.perf_counter()
    html_text_table(SF_DIR).count()
    out["html_text"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    extract_links_table(SF_DIR).count()
    out["extract_links"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    pagerank_links_topk(SF_DIR, k=100, iters=5)
    out["pagerank_links"] = round(time.perf_counter() - t0, 3)

    # field/positional ranking over the documents table
    from vexor_ray.functions.bm25f import bm25f_topk
    from vexor_ray.pipelines.corpus import proximity_topk_table

    t0 = time.perf_counter()
    bm25f_topk(SF_DIR, "table query join", k=10)
    out["bm25f"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    proximity_topk_table(SF_DIR, "table query join", k=10)
    out["proximity_topk"] = round(time.perf_counter() - t0, 3)

    # percolation at alerting scale: 10k stored queries in ONE corpus scan
    # via the inverted query index (the Elasticsearch-percolator shape)
    import random as _rnd

    from vexor_ray.functions.percolate import percolate

    _rng = _rnd.Random(42)
    _vocab = (
        "data table query join index search engine result page link "
        "filter sort group count text token term score rank doc"
    ).split()
    stored = [
        (i, " ".join(_rng.sample(_vocab, _rng.randint(2, 4))))
        for i in range(10_000)
    ]
    docs_ds = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    t0 = time.perf_counter()
    n_pairs = percolate(docs_ds, stored).count()
    out["percolate_10k"] = round(time.perf_counter() - t0, 3)
    out["percolate_10k_pairs"] = int(n_pairs)

    # WARC source throughput over the PAGES corpus (the volume-bearing
    # table at this sf): write one-member-per-record shards, read+parse back
    from vexor_ray.warc import read_warc, write_warc_dataset

    warc_dir = tempfile.mkdtemp(prefix="vx_bench_warc_")
    pages_ds = ray.data.read_parquet(
        sorted(str(f) for f in _pages_dir().glob("*.parquet"))
    )
    t0 = time.perf_counter()
    files = write_warc_dataset(
        pages_ds, warc_dir, url_col="url", ts_col="warc_ts", payload_col="html"
    )
    out["warc_write"] = round(time.perf_counter() - t0, 3)
    out["warc_mb"] = round(
        sum(Path(f).stat().st_size for f in files) / 1e6, 1
    )
    t0 = time.perf_counter()
    n = read_warc(files).count()
    out["warc_read"] = round(time.perf_counter() - t0, 3)
    out["warc_records"] = int(n)
    shutil.rmtree(warc_dir, ignore_errors=True)
    return out


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    pages = _pages_dir()
    # warm the OS page cache so we measure compute + shuffle, not cold disk
    for f in Path(pages).glob("part-*.parquet"):
        f.read_bytes()

    build = bench_build(pages, NUM_CPUS)
    if os.environ.get("VEXOR_BENCH_BUILD_ONLY"):
        # scaling legs time the build alone: the north-rule efficiency metric
        # is indexing throughput, and the query/operator suite would add
        # minutes of unrelated wall time per fresh process
        queries, ops = {}, {}
    else:
        queries = bench_queries(build["index_dir"])
        queries.update(bench_impact(pages, NUM_CPUS))
        queries.update(bench_deletes(pages, build["index_dir"]))
        ops = bench_operators()
    ray.shutdown()

    q = {
        "index_build": build["build_sec"],
        "docs_per_sec": build["docs_per_sec"],
        **queries,
        **ops,
    }
    return {
        "metric": "bm25_index_build_and_query",
        "value": build["build_sec"],
        "unit": "sec",
        "queries": q,
        "sf": _sf_name(),
        "num_cpus": NUM_CPUS,
        "pages": _pages_rows(),
        "stage_walls": build["stage_walls"],
    }


def run_scaling(repeats: int = 3) -> dict:
    """N vs 4N CPUs on the same input, median of ``repeats`` fresh processes.

    The single-node sandbox shows double-digit-percent run-to-run variance
    (shared VM); medians keep one noisy leg from swinging the efficiency.
    """
    # generate corpus once before timing either level
    _pages_dir()
    results: dict[int, list[dict]] = {8: [], 32: []}
    for _ in range(repeats):
        for ncpu in (8, 32):
            env = dict(
                os.environ, RAY_GRAFT_CPUS=str(ncpu), VEXOR_BENCH_BUILD_ONLY="1"
            )
            # scaling is measured at 4x the default corpus so parallel
            # compute dominates the per-execution fixed costs
            env.setdefault("VEXOR_BENCH_PAGES", "400000")
            out = subprocess.run(
                [sys.executable, str(Path(__file__).resolve())],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            ).stdout
            results[ncpu].append(json.loads(out.strip().splitlines()[-1]))
    t8_seq = [r["value"] for r in results[8]]
    t32_seq = [r["value"] for r in results[32]]
    t8s, t32s = sorted(t8_seq), sorted(t32_seq)
    t8 = statistics.median(t8s)
    t32 = statistics.median(t32s)
    eff = (t8 / t32) / (32 / 8)
    # self-audit for this host's phase drift (see BASELINE.md): each (8, 32)
    # pair ran back-to-back, so pairwise ratios share a measurement window;
    # a window whose repeat spread exceeds ~30% should be DISCARDED, not
    # averaged — the flag makes an invalid run announce itself
    pair_eff = [
        round((a / b) / (32 / 8), 3) for a, b in zip(t8_seq, t32_seq)
    ]
    spread_8 = round((max(t8s) - min(t8s)) / t8, 3)
    spread_32 = round((max(t32s) - min(t32s)) / t32, 3)
    return {
        "sec_8": t8,
        "sec_32": t32,
        "sec_8_runs": t8s,
        "sec_32_runs": t32s,
        "docs_per_sec_8": round(results[8][0]["pages"] / t8, 1),
        "docs_per_sec_32": round(results[32][0]["pages"] / t32, 1),
        "scaling_efficiency": round(eff, 3),
        "pair_efficiencies": pair_eff,
        "spread_8": spread_8,
        "spread_32": spread_32,
        "window_valid": bool(spread_8 <= 0.3 and spread_32 <= 0.3),
        "pages": results[32][0]["pages"],
        "note": "logical-parallelism scaling (single sandbox node), N=8 vs 4N=32 CPUs, median of repeats; discard windows with window_valid=false",
    }


def run_serving_scaling(pool_sizes=(2, 8), passes: int = 8) -> dict:
    """Query-SERVING throughput scaling: one index, a fixed query workload,
    QueryPool with N vs 4N warm searcher actors (each actor its own
    process).  Complements the build-scaling arm: serving is decode/compute
    bound per actor, so it exercises the multi-worker story without the
    build encoder's shared-memory-bandwidth ceiling (BASELINE.md)."""
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from vexor_ray.fixtures.pages import generate_queries
    from vexor_ray.index.build import build_index
    from vexor_ray.index.manifest import manifest_exists
    from vexor_ray.query.server import QueryPool

    pages = _pages_dir()
    idx = Path(f"/tmp/vx_bench_idx_{_pages_rows()}")
    if not manifest_exists(idx):
        build_index(pages, idx, _build_cfg(NUM_CPUS))
    workload = generate_queries(120, seed=42) * passes
    qps: dict[int, float] = {}
    base_queries = generate_queries(120, seed=42)
    import ray as _ray

    runs: dict[int, list[float]] = {n: [] for n in pool_sizes}
    repeats = 3
    for _ in range(repeats):
        # interleaved legs: each (lo, hi) pair shares a measurement window,
        # the same phase-drift discipline as the build-scaling arm
        for n_workers in pool_sizes:
            pool = QueryPool(str(idx), num_workers=n_workers, warm_terms=64)
            # warm EVERY actor over the full distinct-query set: round-robin
            # warming leaves the bigger pool colder per actor (each sees 1/N
            # of the repeats), which would bias the ratio against it
            _ray.get(
                [w.search_batch.remote(base_queries, "auto") for w in pool.workers]
            )
            t0 = time.perf_counter()
            pool.search_many(workload, batch_size=24)
            runs[n_workers].append(len(workload) / (time.perf_counter() - t0))
            pool.shutdown()
    ray.shutdown()
    lo, hi = pool_sizes
    qps = {n: round(statistics.median(v), 1) for n, v in runs.items()}
    pair_eff = [
        round((b / a) / (hi / lo), 3) for a, b in zip(runs[lo], runs[hi])
    ]
    spread = {
        str(n): round((max(v) - min(v)) / min(v), 3) for n, v in runs.items()
    }
    return {
        "metric": "serving_scaling",
        "qps_per_pool": {str(k): v for k, v in qps.items()},
        "qps_runs": {str(n): [round(x, 1) for x in v] for n, v in runs.items()},
        "workers": list(pool_sizes),
        "scaling_efficiency": round((qps[hi] / qps[lo]) / (hi / lo), 3),
        "pair_efficiencies": pair_eff,
        "spread": spread,
        "window_valid": all(s <= 0.3 for s in spread.values()),
        "n_queries": len(workload),
        "sf": _sf_name(),
        "num_cpus": NUM_CPUS,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--serving-scaling" in sys.argv:
        print(json.dumps(run_serving_scaling()))
    else:
        print(json.dumps(run_bench()))
