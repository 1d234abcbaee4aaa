"""Retrieval-quality eval: MRR@10 / Hit@1 / Hit@5 per retrieval arm.

Port of the reference's quality harness shape (``scripts/eval_hybrid.py:
59-139``: query set → per-arm ranked lists → MRR/Hit metrics) onto the
fixture corpus: each eval query is a 6-token phrase sampled from the middle
of one page, whose docID is the single relevant result.  Arms:

- ``bm25_exact`` / ``bm25_wand`` — the engine's two scorers (must tie);
- ``dense`` — cosine over word-bigram hash embeddings (functions/embed.py);
- ``hybrid`` — weighted RRF of dense + BM25 (query/searcher.py);
- ``rerank_bm25l`` — BM25L candidate rerank arm (query/rerank.py).

Usage: ``python scripts/eval_retrieval.py [n_pages] [n_queries]`` — prints
one JSON line {arm: {mrr_at_10, hit_at_1, hit_at_5}, ...}.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def build_eval_queries(pages_dir: Path, n_queries: int, seed: int = 9):
    """[(query_text, relevant_docID)] — phrases sampled from page middles."""
    import pyarrow.parquet as pq

    from vexor_ray.refimpl.bm25 import tokenize
    from vexor_ray.refimpl.textnorm import extract_text

    rng = np.random.default_rng(seed)
    rows = []
    for fi, f in enumerate(sorted(pages_dir.glob("part-*.parquet"))):
        t = pq.read_table(f, columns=["url", "html"])
        for ri, h in enumerate(t["html"].to_pylist()):
            rows.append(((fi << 32) | ri, h))
    picks = rng.choice(len(rows), size=min(4 * n_queries, len(rows)), replace=False)
    out = []
    for idx in picks:
        doc_id, html = rows[int(idx)]
        text = extract_text(html)
        if not text:
            continue
        toks = tokenize(text)
        if len(toks) < 24:
            continue
        start = len(toks) // 2
        phrase = " ".join(toks[start : start + 6])
        out.append((phrase, doc_id))
        if len(out) >= n_queries:
            break
    return out


def metrics(ranked_ids: list[list[int]], relevant: list[int]) -> dict:
    rr, h1, h5 = [], 0, 0
    for ids, rel in zip(ranked_ids, relevant):
        try:
            rank = ids.index(rel) + 1
        except ValueError:
            rank = None
        rr.append(1.0 / rank if rank and rank <= 10 else 0.0)
        h1 += 1 if rank == 1 else 0
        h5 += 1 if rank and rank <= 5 else 0
    n = len(relevant) or 1
    return {
        "mrr_at_10": round(sum(rr) / n, 4),
        "hit_at_1": round(h1 / n, 4),
        "hit_at_5": round(h5 / n, 4),
    }


def run_eval(n_pages: int = 10_000, n_queries: int = 30) -> dict:
    import pyarrow as pa
    import ray.data

    from vexor_ray.fixtures.pages import write_pages
    from vexor_ray.functions.ann import brute_force_topk
    from vexor_ray.functions.embed import hash_embed, hash_embed_batch
    from vexor_ray.index.build import BuildConfig, build_index
    from vexor_ray.index.manifest import MANIFEST_NAME
    from vexor_ray.query.rerank import rerank_bm25l, resolve_rerank_candidates
    from vexor_ray.query.searcher import Searcher, rrf_fuse_orders
    from vexor_ray.stages.docids import read_with_doc_ids
    from vexor_ray.stages.extract import make_extract_fn

    pages = write_pages(f"/tmp/vx_eval_pages_{n_pages}", n_pages, seed=42,
                        rows_per_file=max(n_pages // 8, 1))
    idx = Path(f"/tmp/vx_eval_idx_{n_pages}")
    if not (idx / MANIFEST_NAME).exists():
        build_index(pages, idx, BuildConfig(num_waves=2, partitions_per_wave=8,
                                            tokenize_concurrency=8))
    s = Searcher(idx)
    queries = build_eval_queries(Path(pages), n_queries)
    qtexts = [q for q, _ in queries]
    relevant = [r for _, r in queries]

    # dense arm: embed the corpus with the lineage docIDs (Ray pipeline),
    # embed the queries driver-side, broadcast + partial top-k
    files = sorted(str(f) for f in Path(pages).glob("part-*.parquet"))
    ds = read_with_doc_ids(files, ["url", "html"])
    ds = ds.map_batches(make_extract_fn(), batch_format="pyarrow",
                        batch_size=256, zero_copy_batch=True)
    from vexor_ray.functions.embed import bucket_doc_freq, idf_weights

    def dense_orders(idf):
        emb_ds = ds.map_batches(
            hash_embed_batch,
            fn_kwargs={"dim": 4096, "mode": "word_mix", "n": 2, "idf": idf},
            batch_format="pyarrow", zero_copy_batch=True)
        qemb = hash_embed(qtexts, dim=4096, n=2, mode="word_mix", idf=idf)
        dense_top = brute_force_topk(emb_ds, qemb.astype(np.float64), k=50,
                                     id_col="doc_id")
        by_q: dict[int, list[int]] = {}
        cos_q: dict[int, dict[int, float]] = {}
        dt = dense_top.to_pydict()
        for qi, vid, cos in zip(dt["query_idx"], dt["vec_id"], dt["cosine"]):
            by_q.setdefault(qi, []).append(vid)
            cos_q.setdefault(qi, {})[vid] = cos
        return by_q, cos_q

    dense_by_q, dcos_by_q = dense_orders(None)
    bdf, n_docs = bucket_doc_freq(ds, dim=4096, mode="word_mix", n=2)
    idf = idf_weights(bdf, n_docs)
    idf_by_q, _ = dense_orders(idf)

    # PQ arm: the 32x-compressed ADC scan + exact rerank over the SAME idf
    # embeddings — measures what product quantization costs in retrieval
    # quality (rerank makes surviving scores exact, so only recall differs)
    from vexor_ray.functions.ann import pq_adc_topk, pq_encode, pq_train

    emb_ds_pq = ds.map_batches(
        hash_embed_batch,
        fn_kwargs={"dim": 4096, "mode": "word_mix", "n": 2, "idf": idf},
        batch_format="pyarrow", zero_copy_batch=True)
    books = pq_train(emb_ds_pq, m_subspaces=64, k_codes=256, iters=2,
                     id_col="doc_id")
    codes = pq_encode(emb_ds_pq, books, id_col="doc_id")
    qemb_pq = hash_embed(qtexts, dim=4096, n=2, mode="word_mix", idf=idf)
    pq_top = pq_adc_topk(codes, books, qemb_pq.astype(np.float64), k=50,
                         id_col="doc_id", rerank_embeddings=emb_ds_pq,
                         rerank_factor=4)
    pq_by_q: dict[int, list[int]] = {}
    pt = pq_top.to_pydict()
    for qi, vid in zip(pt["query_idx"], pt["vec_id"]):
        pq_by_q.setdefault(qi, []).append(vid)

    # IVF-PQ arm: the fully composed 100 TB shape — coarse probe restricts
    # the ADC scan to nprobe cells before the exact rerank
    from vexor_ray.functions.ann import ivf_pq_topk

    ivfpq_top = ivf_pq_topk(
        emb_ds_pq, qemb_pq.astype(np.float64), k=50,
        k_cells=16, nprobe=4, m_subspaces=64, k_codes=256,
        rerank_factor=4, id_col="doc_id",
    )
    ivfpq_by_q: dict[int, list[int]] = {}
    it = ivfpq_top.to_pydict()
    for qi, vid in zip(it["query_idx"], it["vec_id"]):
        ivfpq_by_q.setdefault(qi, []).append(vid)

    arms: dict[str, list[list[int]]] = {
        "bm25_exact": [], "bm25_wand": [], "bm25_prf": [], "dense": [],
        "dense_idf": [], "dense_idf_pq": [], "dense_idf_ivfpq": [],
        "hybrid": [], "hybrid_idf": [],
        "rerank_bm25l": [],
    }
    for qi, qtext in enumerate(qtexts):
        exact = s.search(qtext, k=10, method="exact")
        arms["bm25_exact"].append([d for d, _ in exact])
        arms["bm25_prf"].append(
            [d for d, _ in s.search_prf(qtext, k=10, fb_docs=10, fb_terms=5)]
        )
        arms["bm25_wand"].append(
            [d for d, _ in s.search(qtext, k=10, method="wand")]
        )
        dense_order = dense_by_q.get(qi, [])
        arms["dense"].append(dense_order[:10])
        fused = s.search_hybrid(qtext, dense_order, k=10)
        arms["hybrid"].append([d for d, _ in fused])
        idf_order = idf_by_q.get(qi, [])
        arms["dense_idf"].append(idf_order[:10])
        arms["dense_idf_pq"].append(pq_by_q.get(qi, [])[:10])
        arms["dense_idf_ivfpq"].append(ivfpq_by_q.get(qi, [])[:10])
        arms["hybrid_idf"].append(
            [d for d, _ in s.search_hybrid(qtext, idf_order, k=10)]
        )
        # rerank arm: BM25 candidates + dense cosine as the semantic score
        n_cand = resolve_rerank_candidates(10)
        cands_scored = s.search(qtext, k=n_cand, method="exact")
        meta = s.lookup_meta([d for d, _ in cands_scored])
        dcos = dcos_by_q.get(qi, {})
        cands = [
            {
                "doc_id": d,
                "score": max(dcos.get(d, 0.0), 0.0),
                "url": meta.get(d, ("", None))[0],
                "preview": meta.get(d, ("", None))[1],
            }
            for d, _ in cands_scored
        ]
        arms["rerank_bm25l"].append(
            [c["doc_id"] for c in rerank_bm25l(qtext, cands)[:10]]
        )

    # provider arms: a SECOND index whose embeddings come through the
    # OpenAI-compatible HTTP provider seam (an in-process stub serving the
    # hash featurizer), then search_dense / search_hybrid_text against it —
    # the e2e wire path the reference drives in scripts/eval_hybrid.py.
    prov_arms = _provider_arms(pages, n_pages, qtexts)
    for name, ranked in prov_arms.items():
        arms[name] = ranked

    return {
        "n_pages": n_pages,
        "n_queries": len(qtexts),
        "arms": {name: metrics(ranked, relevant) for name, ranked in arms.items()},
    }


def _provider_arms(pages, n_pages: int, qtexts: list[str]) -> dict:
    """dense_provider / hybrid_provider ranked lists via an in-process
    OpenAI-compatible stub that serves the word_mix hash featurizer
    (dim 1024) — so the row measures the WIRE PATH, not a new model."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from vexor_ray.functions.embed import hash_embed
    from vexor_ray.index.build import BuildConfig, build_index
    from vexor_ray.index.manifest import MANIFEST_NAME
    from vexor_ray.query.searcher import Searcher

    DIM = 1024

    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            payload = _json.loads(
                self.rfile.read(int(self.headers["Content-Length"]))
            )
            vecs = hash_embed(payload["input"], dim=DIM, n=2, mode="word_mix")
            body = _json.dumps(
                {
                    "data": [
                        {"index": i, "embedding": v.tolist()}
                        for i, v in enumerate(vecs)
                    ]
                }
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base_url = f"http://127.0.0.1:{srv.server_port}/v1"
    try:
        idx = Path(f"/tmp/vx_eval_idx_prov_{n_pages}")
        if not (idx / MANIFEST_NAME).exists():
            build_index(
                pages,
                idx,
                BuildConfig(
                    text_only=True,
                    embed_provider={
                        "kind": "openai",
                        "base_url": base_url,
                        "model": "stub-hash-1024",
                        "batch_size": 64,
                        "require_key": False,
                    },
                    num_waves=1,
                    partitions_per_wave=8,
                    tokenize_concurrency=8,
                ),
            )
        sp = Searcher(idx)
        # the searcher embeds queries through the SAME provider spec the
        # manifest recorded; point it at this process's stub port
        sp.manifest["config"]["embed_provider"]["base_url"] = base_url
        out = {"dense_provider": [], "hybrid_provider": []}
        for qtext in qtexts:
            out["dense_provider"].append(
                [d for d, _ in sp.search_dense(qtext, k=10)]
            )
            out["hybrid_provider"].append(
                [d for d, _ in sp.search_hybrid_text(qtext, k=10)]
            )
        return out
    finally:
        srv.shutdown()


def main():
    import ray

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    out = run_eval(n_pages, n_queries)
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
