"""BM25 pipelines over the driver's ``documents`` table.

The ``documents`` corpus ``(doc_id:int64, text, lang, source, n_chars)`` is
indexed text-only (the lexical document is the text itself).  The engine's
internal docIDs are ranks of ``url = f"{doc_id:020d}"`` — numeric order —
and every result is mapped back to the ORIGINAL ``doc_id`` via the docs
table, so outputs are directly comparable to DuckDB oracles over the same
parquet.

Indexes are built once per (corpus fingerprint, config) under /tmp and
reused across calls (the build itself is checkpointed + resumable).
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..hashing import file_fingerprint
from ..index.build import BuildConfig, build_index
from ..index.manifest import MANIFEST_NAME
from ..query.searcher import Searcher

_CACHE_ROOT = Path("/tmp/vexor_ray_cache")


def documents_as_pages(sf_dir: str) -> ray.data.Dataset:
    """documents parquet → (url, text) dataset with url = zero-padded doc_id."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def to_pages(batch: pa.Table) -> pa.Table:
        urls = [f"{d:020d}" for d in batch.column("doc_id").to_pylist()]
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "text": pc.cast(batch.column("text"), pa.large_string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow", zero_copy_batch=True)


def write_pages_shards(pages: ray.data.Dataset, out_dir: Path) -> list[str]:
    """Streaming sharded parquet write whose sorted FILENAMES follow url order.

    The index build derives lineage docIDs from (position of file in the
    sorted input list, row in file), and the corpus pipelines rely on
    internal docID order ≡ url order.  Ray's write tasks can finish out of
    order, so shards are renamed ``pages-{i:05d}.parquet`` by their first
    url after the (parallel, streaming) write — a #shards-sized metadata
    pass, never a corpus materialization.
    """
    tmp = out_dir.with_name(out_dir.name + ".tmp")
    if tmp.exists():
        import shutil

        shutil.rmtree(tmp)
    tmp.mkdir(parents=True, exist_ok=True)
    pages.write_parquet(str(tmp))
    shards = []
    for f in tmp.glob("*.parquet"):
        pf = pq.ParquetFile(f)
        if pf.metadata.num_rows == 0:
            continue
        first_url = pf.read_row_group(0, columns=["url"]).column("url")[0].as_py()
        shards.append((first_url, f))
    shards.sort()
    for i, (_, f) in enumerate(shards):
        f.rename(tmp / f"pages-{i:05d}.parquet")
    import os

    if out_dir.exists():
        import shutil

        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)
    return sorted(str(f) for f in out_dir.glob("pages-*.parquet"))


def documents_index(
    sf_dir: str, impact: bool = False, stop_words: list | None = None
) -> Path:
    """Build (or reuse) the BM25 index over ``{sf_dir}/documents.parquet``.

    ``impact=True`` builds (and caches separately) the variant carrying the
    impact-ordered companion layout for the Threshold-Algorithm scorer;
    ``stop_words`` builds the analyzer-chain variant (separate cache key,
    list recorded in the manifest so query tokenization matches).
    """
    src = f"{sf_dir}/documents.parquet"
    fp = file_fingerprint([src])
    from ..spec import INDEX_FORMAT_VERSION
    tag = "imp|" if impact else ""
    if stop_words:
        tag += "stop:" + ",".join(sorted(stop_words)) + "|"
    key = hashlib.sha1(f"{tag}{fp}|v{INDEX_FORMAT_VERSION}".encode()).hexdigest()[:16]
    idx_dir = _CACHE_ROOT / f"docs_index_{key}"
    if not (idx_dir / MANIFEST_NAME).exists():
        tmp_pages = idx_dir.parent / (idx_dir.name + "_pages")
        files = write_pages_shards(documents_as_pages(sf_dir), tmp_pages)
        cfg = BuildConfig(
            pre_extracted=True,
            text_only=True,
            num_waves=1,
            partitions_per_wave=4,
            shard_group_size=8,
            tokenize_concurrency=2,
            impact_postings=impact,
            stop_words=sorted(stop_words) if stop_words else None,
        )
        build_index(files, idx_dir, cfg)
    return idx_dir


def prf_topk_table(
    sf_dir: str, query: str, k: int = 10, fb_docs: int = 10, fb_terms: int = 5
) -> pa.Table:
    """Top-k after pseudo-relevance-feedback query expansion
    (``Searcher.expansion_terms``): integer rank-weighted tf over the top
    ``fb_docs`` feedback docs picks ``fb_terms`` expansion terms, then the
    expanded query is scored by the plain exact scorer.  Ranking (like
    ``bm25_topk``) is by 6-decimal-rounded score then doc_id so the SQL
    twin's unspecified SUM order cannot flip the cut."""
    from ..spec import MAX_QUERY_TERMS

    s = DocumentsSearcher(sf_dir)
    searcher = s.searcher
    terms = searcher.preprocess_query(query)
    expansion = searcher.expansion_terms(
        terms, fb_docs=fb_docs, fb_terms=fb_terms
    )
    expanded = list(dict.fromkeys(terms + expansion))[:MAX_QUERY_TERMS]
    chunks = searcher.term_chunks(expanded)
    ids, sc = searcher._exact_scores(expanded, chunks)
    pairs = [(int(d), round(float(x), 6)) for d, x in zip(ids, sc)]
    pairs.sort(key=lambda p: (-p[1], p[0]))
    pairs = pairs[:k]
    urls = searcher.lookup_urls([d for d, _ in pairs])
    return pa.table(
        {
            "doc_id": pa.array([int(urls[d]) for d, _ in pairs], type=pa.int64()),
            "score": pa.array([sc_ for _, sc_ in pairs], type=pa.float64()),
            "rank": pa.array(range(1, len(pairs) + 1), type=pa.int32()),
        }
    )


def facet_counts_table(
    sf_dir: str, query: str, facets: tuple[str, ...] = ("lang", "source")
) -> pa.Table:
    """Search-result faceting: (facet, value, n_docs) over every doc
    matching ≥1 query term (BM25's OR semantics — exactly the docs with a
    positive score, since per-term contributions are strictly positive).

    The match set streams against the source table in batches with a
    sorted-array membership mask (searchsorted, no value_set broadcast of
    a giant is_in), then per-batch Arrow group-counts merge driver-side —
    facet cardinality is tiny even when the match set is corpus-sized."""
    import numpy as np

    s = DocumentsSearcher(sf_dir)
    sr = s.searcher
    terms = sr.preprocess_query(query)
    ids, _sc = sr._exact_scores(terms, sr.term_chunks(terms))  # docID-asc
    match = np.sort(orig_ids_streamed(sr, ids))
    counts: dict[tuple[str, str], int] = {}
    import pyarrow.dataset as pads

    ds = pads.dataset(f"{sf_dir}/documents.parquet")
    for rb in ds.to_batches(columns=["doc_id", *facets], batch_size=65536):
        ids = rb.column("doc_id").to_numpy()
        if ids.size == 0 or match.size == 0:
            continue
        pos = np.searchsorted(match, ids)
        pos[pos >= match.size] = match.size - 1
        live = match[pos] == ids
        if not live.any():
            continue
        tbl = pa.Table.from_batches([rb]).filter(pa.array(live))
        for f in facets:
            g = pa.TableGroupBy(tbl.select([f]), f).aggregate([([], "count_all")])
            for v, n in zip(
                g.column(f).to_pylist(), g.column("count_all").to_pylist()
            ):
                key = (f, str(v))
                counts[key] = counts.get(key, 0) + int(n)
    rows = sorted(counts.items())
    return pa.table(
        {
            "facet": pa.array([k[0] for k, _ in rows], type=pa.string()),
            "value": pa.array([k[1] for k, _ in rows], type=pa.string()),
            "n_docs": pa.array([n for _, n in rows], type=pa.int64()),
        }
    )


def autocomplete_table(sf_dir: str, prefix: str, k: int = 10) -> pa.Table:
    """(term, df) prefix suggestions by (df desc, term asc) — exact SQL
    twin: df == COUNT(DISTINCT doc_id) because each doc contributes one
    posting per distinct term."""
    s = DocumentsSearcher(sf_dir)
    rows = s.searcher.autocomplete(prefix, k)
    return pa.table(
        {
            "term": pa.array([t for t, _ in rows], type=pa.string()),
            "df": pa.array([d for _, d in rows], type=pa.int64()),
        }
    )


def boosted_topk_table(sf_dir: str, query: str, k: int = 10) -> pa.Table:
    """Static-rank fusion: BM25 × a per-document boost (web search's
    "query score × document prior" shape — PageRank, freshness, quality).

    The prior here is ``1 + n_chars/4096`` — a DYADIC rational, so the
    multiplication is bit-identical between numpy and the SQL twin; the
    BM25 factor is 6-decimal-rounded first (the established cross-engine
    stabilization).  The boost column streams against the match set with
    the same sorted-membership mask as ``facet_counts_table`` — at scale
    the prior would live in the docs checkpoint, fetched the same way."""
    import numpy as np
    import pyarrow.dataset as pads

    s = DocumentsSearcher(sf_dir)
    sr = s.searcher
    terms = sr.preprocess_query(query)
    iid, raw = sr._exact_scores(terms, sr.term_chunks(terms))  # docID-asc
    ids = orig_ids_streamed(sr, iid)  # ascending too (url order ≡ id order)
    sc = np.round(raw, 6)
    best: list[tuple[float, int]] = []  # (-fused, doc_id)
    ds = pads.dataset(f"{sf_dir}/documents.parquet")
    for rb in ds.to_batches(columns=["doc_id", "n_chars"], batch_size=65536):
        bid = rb.column("doc_id").to_numpy()
        if bid.size == 0 or ids.size == 0:
            continue
        pos = np.searchsorted(ids, bid)
        pos[pos >= ids.size] = ids.size - 1
        live = ids[pos] == bid
        if not live.any():
            continue
        nch = rb.column("n_chars").to_numpy()[live].astype(np.float64)
        fused = np.round(sc[pos[live]] * (1.0 + nch / 4096.0), 6)
        for d, f in zip(bid[live], fused):
            best.append((-float(f), int(d)))
    best.sort()
    best = best[:k]
    return pa.table(
        {
            "doc_id": pa.array([d for _, d in best], type=pa.int64()),
            "fused": pa.array([-f for f, _ in best], type=pa.float64()),
            "rank": pa.array(range(1, len(best) + 1), type=pa.int32()),
        }
    )


def more_like_this_table(
    sf_dir: str, doc_id: int, k: int = 10, n_terms: int = 10
) -> pa.Table:
    """Similar-document retrieval: the source doc's top tf·idf terms become
    a BM25 query; the source itself is excluded from the hits.

    Deterministic and SQL-twinnable end to end: term weight = tf *
    ln((N - df + 0.5)/(df + 0.5) + 1.0) — integer tf, libm ln on identical
    operands (the PMI twin already pins ln parity on this host), ties
    broken by term ascending; the final ranking is the established
    (ROUND(score,6) DESC, doc_id ASC).  Costs: one row-group-pruned read
    of the source row, one dictionary df lookup per source term, one
    exact-scorer pass over the expansion — O(k) driver state."""
    import math

    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from ..spec import TOKEN_RE

    s = DocumentsSearcher(sf_dir)
    sr = s.searcher
    ds = pads.dataset(f"{sf_dir}/documents.parquet")
    tbl = ds.to_table(columns=["text"], filter=pc.field("doc_id") == doc_id)
    if tbl.num_rows != 1:
        raise KeyError(f"doc_id {doc_id} not found")
    toks = TOKEN_RE.findall(tbl.column("text")[0].as_py().lower())
    tf: dict[str, int] = {}
    for t in toks:
        tf[t] = tf.get(t, 0) + 1
    n_docs = sr.doc_count
    chunks_by_term = sr.term_chunks(sorted(tf))
    weights = []
    for term in sorted(tf):
        df = sum(c["n_postings"] for c in chunks_by_term.get(term, []))
        if df == 0:
            continue
        w = tf[term] * math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        weights.append((-w, term))
    weights.sort()
    terms = [t for _, t in weights[:n_terms]]

    iid, raw = sr._exact_scores(terms, sr.term_chunks(terms))
    ids = orig_ids_streamed(sr, iid)
    sc = np.round(raw, 6)
    keep = ids != doc_id
    ids, sc = ids[keep], sc[keep]
    order = np.lexsort((ids, -sc))[:k]
    return pa.table(
        {
            "doc_id": pa.array(ids[order], type=pa.int64()),
            "score": pa.array(sc[order], type=pa.float64()),
            "rank": pa.array(
                np.arange(1, order.size + 1, dtype=np.int32), type=pa.int32()
            ),
        }
    )


def pagerank_boosted_table(
    sf_dir: str, query: str, k: int = 10, iters: int = 5
) -> pa.Table:
    """BM25 × PageRank static-rank fusion: the real web-search "query score
    × link-authority prior" composition.  Scores are 6dp-rounded BM25; the
    prior is the fixed-point integer rank from
    :func:`vexor_ray.functions.graph.pagerank` cast to double (int64→double
    is correctly rounded in numpy and DuckDB alike, and the IEEE product of
    identical doubles is identical — so ``fused`` is twin-exact with no
    extra rounding).  The corpus-sized rank dataset streams against the
    match set with a sorted-membership mask; only match-set-sized state
    ever reaches the driver."""
    import numpy as np

    from ..functions.graph import pagerank

    s = DocumentsSearcher(sf_dir)
    sr = s.searcher
    terms = sr.preprocess_query(query)
    iid, raw = sr._exact_scores(terms, sr.term_chunks(terms))  # docID-asc
    ids = orig_ids_streamed(sr, iid)  # ascending (url order ≡ id order)
    sc = np.round(raw, 6)
    best: list[tuple[float, int]] = []  # (-fused, doc_id)
    ranks = pagerank(sf_dir, iters=iters)
    for rb in ranks.iter_batches(batch_size=65536, batch_format="pyarrow"):
        bid = rb.column("doc_id").to_numpy()
        if bid.size == 0 or ids.size == 0:
            continue
        pos = np.searchsorted(ids, bid)
        pos[pos >= ids.size] = ids.size - 1
        live = ids[pos] == bid
        if not live.any():
            continue
        prior = rb.column("rank").to_numpy()[live].astype(np.float64)
        fused = sc[pos[live]] * prior
        for d, f in zip(bid[live], fused):
            best.append((-float(f), int(d)))
        best.sort()
        del best[k:]
    return pa.table(
        {
            "doc_id": pa.array([d for _, d in best], type=pa.int64()),
            "fused": pa.array([-f for f, _ in best], type=pa.float64()),
            "rank": pa.array(range(1, len(best) + 1), type=pa.int32()),
        }
    )


def anchor_boosted_table(
    sf_dir: str, query: str, k: int = 10, weight: float = 0.25
) -> pa.Table:
    """BM25 + anchor-text fusion: pages whose IN-LINK anchor terms match
    the query get boosted — the BM25F-style anchor field of web ranking
    (``functions/anchors.py``).

    ``fused = ROUND(bm25, 6) + weight * anchor_cnt`` over the BM25 match
    set; ``weight`` is dyadic (default 1/4) so ``weight * cnt`` is exact
    and the single IEEE addition is twin-identical.  The anchor side is
    query-filtered inside its map stage, so only query-relevant anchors
    are shuffled and the driver holds match-set-sized state only."""
    import numpy as np

    from ..functions.anchors import anchor_counts_for_terms

    s = DocumentsSearcher(sf_dir)
    sr = s.searcher
    terms = sr.preprocess_query(query)
    iid, raw = sr._exact_scores(terms, sr.term_chunks(terms))
    ids = orig_ids_streamed(sr, iid)  # ascending (url order = id order)
    sc = np.round(raw, 6)
    fused = sc.copy()
    a_dst, a_cnt = anchor_counts_for_terms(sf_dir, terms)
    if a_dst.size and ids.size:
        pos = np.searchsorted(ids, a_dst)
        pos[pos >= ids.size] = ids.size - 1
        live = ids[pos] == a_dst
        fused[pos[live]] += weight * a_cnt[live].astype(np.float64)
    order = np.lexsort((ids, -fused))[:k]
    return pa.table(
        {
            "doc_id": pa.array(ids[order], type=pa.int64()),
            "fused": pa.array(fused[order], type=pa.float64()),
            "rank": pa.array(
                np.arange(1, order.size + 1, dtype=np.int32), type=pa.int32()
            ),
        }
    )


def proximity_topk_table(
    sf_dir: str, query: str, k: int = 10, weight: float = 0.25
) -> pa.Table:
    """BM25 + term-proximity fusion: docs where two DIFFERENT query terms
    occur close together get boosted — the positional ranking signal on
    top of the bag-of-words score.

    ``fused = ROUND(bm25, 6) + weight / (1.0 + mindist)`` where ``mindist``
    is the minimum position distance between occurrences of two distinct
    query terms (single-term docs get no boost).  The min over all
    distinct-term pairs equals the min over ADJACENT entries of the
    position-sorted occurrence list with differing terms, so the per-doc
    kernel is one ``np.diff`` over the query-term positions.

    Scale shape (the ``bm25f_topk`` pattern): the base-score arrays
    ``(ids, sc)`` ship ONCE via ``ray.put`` (narrow int64/float64, read
    zero-copy in every task); each block fuses its own boosted docs and
    emits only its top-k rows, so the driver merges ≤ blocks×k boosted
    partials plus its own top-k unboosted candidates — never the full
    ``(doc_id, mindist)`` match table.  Exactness: a boosted doc in the
    global top-k is within its block's top-k under the same
    ``(-fused, doc_id)`` comparator; an unboosted doc in the global top-k
    has < k docs above it, each of which has base score above its own, so
    it is within the driver's top-k by base score (boosts are strictly
    positive)."""
    import numpy as np

    from ..spec import TOKEN_RE

    s = DocumentsSearcher(sf_dir)
    sr = s.searcher
    terms = sr.preprocess_query(query)
    iid, raw = sr._exact_scores(terms, sr.term_chunks(terms))
    ids = orig_ids_streamed(sr, iid)  # ascending (url order = id order)
    sc = np.round(raw, 6)
    t_idx = {t: i for i, t in enumerate(terms)}
    base_ref = ray.put((ids, sc))
    block_fn = _ProximityBlockTopK(base_ref, t_idx, TOKEN_RE, weight, k)

    prox = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(block_fn, batch_format="pyarrow", zero_copy_batch=True)
    refs = prox.to_arrow_refs()
    # ≤ k rows per block by construction (asserted in tests)
    tables = [t for t in (ray.get(r) for r in refs) if t.num_rows]

    # unboosted candidates: top-k by base score over the match set the
    # driver already holds (boost > 0, so boosted entries win the dedupe)
    order0 = np.lexsort((ids, -sc))[:k]
    cand_ids = [ids[order0]]
    cand_f = [sc[order0]]
    for t in tables:
        cand_ids.append(t.column("doc_id").to_numpy())
        cand_f.append(t.column("fused").to_numpy())
    c_ids = np.concatenate(cand_ids) if cand_ids else np.empty(0, np.int64)
    c_f = np.concatenate(cand_f) if cand_f else np.empty(0, np.float64)
    if c_ids.size:
        # keep the best (max-fused) entry per doc_id
        byid = np.lexsort((-c_f, c_ids))
        ids_sorted = c_ids[byid]
        first = np.ones(ids_sorted.size, dtype=bool)
        first[1:] = ids_sorted[1:] != ids_sorted[:-1]
        c_ids = ids_sorted[first]
        c_f = c_f[byid][first]
    order = np.lexsort((c_ids, -c_f))[:k]
    return pa.table(
        {
            "doc_id": pa.array(c_ids[order], type=pa.int64()),
            "fused": pa.array(c_f[order], type=pa.float64()),
            "rank": pa.array(
                np.arange(1, order.size + 1, dtype=np.int32), type=pa.int32()
            ),
        }
    )


class _ProximityBlockTopK:
    """Per-block proximity fusion + top-k partial (``proximity_topk_table``).

    Shipped as a callable instance; the base-score arrays arrive as ONE
    object-store ref (zero-copy per task), not re-pickled per batch."""

    def __init__(self, base_ref, t_idx, token_re, weight: float, k: int):
        self._base_ref = base_ref
        self._base = None
        self.t_idx = t_idx
        self.token_re = token_re
        self.weight = weight
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        if self._base is None:
            self._base = ray.get(self._base_ref)
        ids, sc = self._base
        t_idx = self.t_idx
        out_id, out_d = [], []
        for did, text in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            toks = self.token_re.findall((text or "").lower())
            pos, tid = [], []
            for p, t in enumerate(toks):
                i = t_idx.get(t)
                if i is not None:
                    pos.append(p)
                    tid.append(i)
            if len(set(tid)) < 2:
                continue
            p_np = np.asarray(pos, dtype=np.int64)
            t_np = np.asarray(tid, dtype=np.int64)
            neq = t_np[1:] != t_np[:-1]
            out_id.append(int(did))
            out_d.append(int(np.diff(p_np)[neq].min()))
        if not out_id or not ids.size:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "fused": pa.array([], type=pa.float64()),
                }
            )
        p_dst = np.asarray(out_id, dtype=np.int64)
        p_d = np.asarray(out_d, dtype=np.int64)
        pos = np.searchsorted(ids, p_dst)
        pos[pos >= ids.size] = ids.size - 1
        live = ids[pos] == p_dst
        # same expression tree as the twin: weight / (1.0 + mindist)
        fused = sc[pos[live]] + self.weight / (1.0 + p_d[live].astype(np.float64))
        f_ids = p_dst[live]
        order = np.lexsort((f_ids, -fused))[: self.k]
        return pa.table(
            {
                "doc_id": pa.array(f_ids[order], type=pa.int64()),
                "fused": pa.array(fused[order], type=pa.float64()),
            }
        )


def query_language_table(sf_dir: str, query: str, k: int = 10) -> pa.Table:
    """Mini query language (query/qlang.py): must / must-not filters,
    exact-phrase clauses (positions sidecar), prefix and fuzzy expansion,
    all composed onto the exact scorer in one call.  Ranking is by
    6-decimal-rounded score then doc_id (twin-stable)."""
    from ..index.positions import PositionsIndex
    from ..query.qlang import search_query

    s = DocumentsSearcher(sf_dir)
    pos = PositionsIndex(documents_positions_index(sf_dir))
    res = search_query(
        s.searcher, query, k=s.searcher.live_doc_count, positions=pos
    )
    pairs = [(int(d), round(float(x), 6)) for d, x in res]
    pairs.sort(key=lambda p: (-p[1], p[0]))
    pairs = pairs[:k]
    urls = s.searcher.lookup_urls([d for d, _ in pairs])
    return pa.table(
        {
            "doc_id": pa.array([int(urls[d]) for d, _ in pairs], type=pa.int64()),
            "score": pa.array([x for _, x in pairs], type=pa.float64()),
            "rank": pa.array(range(1, len(pairs) + 1), type=pa.int32()),
        }
    )


def bulk_search_table(sf_dir: str, queries: list[str], k: int = 10) -> pa.Table:
    """(query_id, rank, doc_id, score) for a query BATCH streamed through
    the ``search_dataset`` actor-pool stage (query/server.py) — retrieval
    as a composable Ray Data pipeline stage, not a driver loop.  Rounded
    ranking (twin-stable); internal docIDs map back to originals through
    one pruned url lookup of the ≤ n_queries x k hit set."""
    import ray.data

    from ..query.server import search_dataset

    idx = documents_index(sf_dir)
    qds = ray.data.from_items(
        [{"query_id": i + 1, "query": q} for i, q in enumerate(queries)]
    )
    hits = search_dataset(
        qds, str(idx), k=k, rounded=True, concurrency=2
    ).to_pandas()
    s = Searcher(idx)
    urls = s.lookup_urls(sorted(set(int(d) for d in hits["doc_id"])))
    hits["doc_id"] = [int(urls[int(d)]) for d in hits["doc_id"]]
    hits = hits.sort_values(["query_id", "rank"])
    return pa.table(
        {
            "query_id": pa.array(hits["query_id"].to_numpy(), type=pa.int64()),
            "rank": pa.array(hits["rank"].to_numpy(), type=pa.int32()),
            "doc_id": pa.array(hits["doc_id"].to_numpy(), type=pa.int64()),
            "score": pa.array(hits["score"].to_numpy(), type=pa.float64()),
        }
    )


def collapsed_topk_table(
    sf_dir: str, query: str, k: int = 10, group_col: str = "source"
) -> pa.Table:
    """Group-collapsed top-k (SERP host collapse): at most ONE result per
    ``group_col`` value (default: the document's source/site), keeping each
    group's best-ranked doc (rounded score desc, doc_id asc — the same
    order as the final ranking).

    Group keys are fetched ONLY for matched docs via the streamed
    membership mask — never a corpus-wide materialization driver-side.
    Pass ``group_col="text"`` hashed upstream for exact-dup collapse; the
    mechanism is group-agnostic."""
    import numpy as np
    import pyarrow.dataset as pads

    s = DocumentsSearcher(sf_dir)
    sr = s.searcher
    terms = sr.preprocess_query(query)
    iid, raw = sr._exact_scores(terms, sr.term_chunks(terms))  # docID-asc
    ids = orig_ids_streamed(sr, iid)  # ascending (url order ≡ id order)
    sc = np.round(raw, 6)
    fps = np.empty(ids.size, dtype=object)
    ds = pads.dataset(f"{sf_dir}/documents.parquet")
    for rb in ds.to_batches(columns=["doc_id", group_col], batch_size=65536):
        bid = rb.column("doc_id").to_numpy()
        if bid.size == 0 or ids.size == 0:
            continue
        pos = np.searchsorted(ids, bid)
        pos[pos >= ids.size] = ids.size - 1
        live = ids[pos] == bid
        if not live.any():
            continue
        keys = rb.column(group_col).take(
            pa.array(np.flatnonzero(live), type=pa.int64())
        ).to_pylist()
        for p, g in zip(pos[live], keys):
            fps[p] = g
    order = np.lexsort((ids, -sc))
    seen: set[str] = set()
    out: list[tuple[int, float]] = []
    for i in order:
        g = fps[i]
        if g in seen:
            continue
        seen.add(g)
        out.append((int(ids[i]), float(sc[i])))
        if len(out) == k:
            break
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in out], type=pa.int64()),
            "score": pa.array([x for _, x in out], type=pa.float64()),
            "rank": pa.array(range(1, len(out) + 1), type=pa.int32()),
        }
    )


def regex_scan_table(sf_dir: str, pattern: str) -> pa.Table:
    """Non-indexed regex scan over the corpus ("distributed grep"): the
    complement to the inverted index for queries tokens cannot express.

    Stateful actor-pool stage: the pattern compiles ONCE per actor
    (``__init__``), each batch is one vectorized-over-rows findall pass,
    and only matching rows leave the stage — at 100 TB this is a pure
    streaming map with nothing driver-side but the match rows.  The fixed
    patterns used here carry identical semantics in Python ``re`` and
    DuckDB's RE2 (non-overlapping ``findall``), the pii_scrub precedent."""
    import ray.data

    class Scan:
        def __init__(self, pat: str):
            import re

            self.rx = re.compile(pat)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            out_id, out_n = [], []
            for d, t in zip(ids, texts):
                n = len(self.rx.findall(t or ""))
                if n:
                    out_id.append(d)
                    out_n.append(n)
            return pa.table(
                {
                    "doc_id": pa.array(out_id, type=pa.int64()),
                    "n_matches": pa.array(out_n, type=pa.int64()),
                }
            )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    hits = ds.map_batches(
        Scan,
        fn_constructor_kwargs={"pat": pattern},
        batch_format="pyarrow",
        concurrency=2,
        zero_copy_batch=True,
    ).to_pandas()
    if hits.empty:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_matches": pa.array([], type=pa.int64()),
            }
        )
    hits = hits.sort_values("doc_id")
    return pa.Table.from_pandas(hits, preserve_index=False)


def documents_index_deleted(sf_dir: str, mod: int = 17, resid: int = 3) -> Path:
    """``documents_index`` variant with docs ``doc_id % mod == resid``
    DELETED via the tombstone ledger (``index/deletes.py``) — cached
    separately; the shared plain index is never mutated."""
    from ..index.deletes import delete_docs
    from ..index.manifest import load_manifest, manifest_exists
    from ..spec import INDEX_FORMAT_VERSION

    src = f"{sf_dir}/documents.parquet"
    fp = file_fingerprint([src])
    key = hashlib.sha1(
        f"del{mod}.{resid}|{fp}|v{INDEX_FORMAT_VERSION}".encode()
    ).hexdigest()[:16]
    idx_dir = _CACHE_ROOT / f"docs_index_{key}"
    done = False
    if manifest_exists(idx_dir):
        done = bool(load_manifest(idx_dir).get("deletes"))
    if not done:
        tmp_pages = idx_dir.parent / (idx_dir.name + "_pages")
        files = write_pages_shards(documents_as_pages(sf_dir), tmp_pages)
        cfg = BuildConfig(
            pre_extracted=True,
            text_only=True,
            num_waves=1,
            partitions_per_wave=4,
            shard_group_size=8,
            tokenize_concurrency=2,
        )
        build_index(files, idx_dir, cfg)
        ids = pq.read_table(src, columns=["doc_id"]).column("doc_id").to_pylist()
        victims = [f"{i:020d}" for i in ids if i % mod == resid]
        delete_docs(idx_dir, victims)
    return idx_dir


def bm25_after_delete_table(
    sf_dir: str, query: str, mod: int = 17, resid: int = 3
) -> pa.Table:
    """(doc_id, score) for every doc matching ``query`` AFTER deleting the
    docs with ``doc_id % mod == resid`` from the index (tombstone masking +
    live stats — no rebuild).  The SQL twin scores the complement corpus
    from scratch, so a hash match proves delete-then-query ≡
    filter-then-build."""
    idx_dir = documents_index_deleted(sf_dir, mod, resid)
    searcher = Searcher(idx_dir)
    res = searcher.search(query, k=searcher.live_doc_count)
    urls = searcher.lookup_urls([d for d, _ in res])
    pairs = sorted((int(urls[d]), round(sc, 6)) for d, sc in res)
    return pa.table(
        {
            "doc_id": pa.array([p[0] for p in pairs], type=pa.int64()),
            "score": pa.array([p[1] for p in pairs], type=pa.float64()),
        }
    )


def documents_positions_index(sf_dir: str) -> Path:
    """Build (or reuse) the positional sidecar over the documents corpus.

    Built from the SAME sorted pages shards as ``documents_index`` so the
    lineage docIDs agree — a phrase hit maps back to the original doc_id
    through the BM25 index's url lookup.
    """
    from ..index.positions import PositionsConfig, build_positions_index

    src = f"{sf_dir}/documents.parquet"
    fp = file_fingerprint([src])
    from ..spec import INDEX_FORMAT_VERSION

    key = hashlib.sha1(f"pos|{fp}|v{INDEX_FORMAT_VERSION}".encode()).hexdigest()[:16]
    pos_dir = _CACHE_ROOT / f"docs_positions_{key}"
    from ..index.manifest import manifest_exists

    if not manifest_exists(pos_dir):
        bm_dir = documents_index(sf_dir)  # ensures the pages shards exist
        pages_dir = bm_dir.parent / (bm_dir.name + "_pages")
        if not pages_dir.exists():
            write_pages_shards(documents_as_pages(sf_dir), pages_dir)
        cfg = PositionsConfig(
            pre_extracted=True,
            text_only=True,
            num_waves=1,
            partitions_per_wave=4,
            shard_group_size=8,
            tokenize_concurrency=2,
        )
        build_positions_index(pages_dir, pos_dir, cfg)
    return pos_dir


def phrase_match_table(sf_dir: str, phrase: str) -> pa.Table:
    """(doc_id, n_occ) for documents containing the exact token phrase,
    via the positional sidecar's chain-key intersection."""
    from ..index.positions import PositionsIndex

    pidx = PositionsIndex(documents_positions_index(sf_dir))
    occ = pidx.phrase_occurrences(phrase)
    internal = occ["doc_id"].to_pylist()
    searcher = Searcher(documents_index(sf_dir))
    urls = searcher.lookup_urls(internal)
    # internal docID order == url order == original doc_id order, so the
    # output is already doc_id-ascending
    return pa.table(
        {
            "doc_id": pa.array([int(urls[d]) for d in internal], type=pa.int64()),
            "n_occ": pa.array(
                [int(x) for x in occ["n_occ"].to_pylist()], type=pa.int64()
            ),
        }
    )


def near_match_table(sf_dir: str, term_a: str, term_b: str, window: int) -> pa.Table:
    """(doc_id, min_dist) for documents where the two terms occur within
    ``window`` tokens of each other (unordered proximity)."""
    from ..index.positions import PositionsIndex

    pidx = PositionsIndex(documents_positions_index(sf_dir))
    occ = pidx.near_occurrences(term_a, term_b, window)
    internal = occ["doc_id"].to_pylist()
    searcher = Searcher(documents_index(sf_dir))
    urls = searcher.lookup_urls(internal)
    return pa.table(
        {
            "doc_id": pa.array([int(urls[d]) for d in internal], type=pa.int64()),
            "min_dist": pa.array(
                [int(x) for x in occ["min_dist"].to_pylist()], type=pa.int64()
            ),
        }
    )


def boolean_topk_table(
    sf_dir: str,
    must: list[str],
    should: list[str],
    must_not: list[str],
    k: int = 10,
) -> pa.Table:
    """Boolean-filtered BM25 top-k with the rounding-stable ranking of
    ``bm25_topk_table`` (score everything matching, rank by rounded score)."""
    s = DocumentsSearcher(sf_dir)
    res = s.searcher.search_boolean(must, should, must_not, k=s.searcher.doc_count)
    pairs = [(d, round(sc, 6)) for d, sc in s._to_orig(res)]
    pairs.sort(key=lambda p: (-p[1], p[0]))
    pairs = pairs[:k]
    return pa.table(
        {
            "doc_id": pa.array([p[0] for p in pairs], type=pa.int64()),
            "score": pa.array([p[1] for p in pairs], type=pa.float64()),
            "rank": pa.array(range(1, len(pairs) + 1), type=pa.int32()),
        }
    )


def boolean_msm_topk_table(
    sf_dir: str, should: list[str], min_should_match: int, k: int = 10
) -> pa.Table:
    """min_should_match boolean BM25 top-k: docs containing at least m
    distinct should terms, ranked with the rounding-stable ranking."""
    s = DocumentsSearcher(sf_dir)
    res = s.searcher.search_boolean(
        should=should,
        k=s.searcher.doc_count,
        min_should_match=min_should_match,
    )
    pairs = [(d, round(sc, 6)) for d, sc in s._to_orig(res)]
    pairs.sort(key=lambda p: (-p[1], p[0]))
    pairs = pairs[:k]
    return pa.table(
        {
            "doc_id": pa.array([p[0] for p in pairs], type=pa.int64()),
            "score": pa.array([p[1] for p in pairs], type=pa.float64()),
            "rank": pa.array(range(1, len(pairs) + 1), type=pa.int32()),
        }
    )


def prefix_topk_table(sf_dir: str, prefix: str, k: int = 10) -> pa.Table:
    """Wildcard ``prefix*`` BM25 top-k over the documents corpus, with the
    rounding-stable ranking of ``bm25_topk_table``."""
    s = DocumentsSearcher(sf_dir)
    res = s.searcher.search_prefix(prefix, k=s.searcher.doc_count, max_terms=None)
    pairs = [(d, round(sc, 6)) for d, sc in s._to_orig(res)]
    pairs.sort(key=lambda p: (-p[1], p[0]))
    pairs = pairs[:k]
    return pa.table(
        {
            "doc_id": pa.array([p[0] for p in pairs], type=pa.int64()),
            "score": pa.array([p[1] for p in pairs], type=pa.float64()),
            "rank": pa.array(range(1, len(pairs) + 1), type=pa.int32()),
        }
    )


def fuzzy_topk_table(sf_dir: str, query: str, k: int = 10) -> pa.Table:
    """Typo-tolerant BM25 top-k: every query token expands to corpus terms
    within Levenshtein distance 1 (uncapped — mirrors the SQL twin), with
    the rounding-stable ranking of ``bm25_topk_table``."""
    s = DocumentsSearcher(sf_dir)
    res = s.searcher.search_fuzzy(
        query, k=s.searcher.doc_count, max_terms_per_token=None
    )
    pairs = [(d, round(sc, 6)) for d, sc in s._to_orig(res)]
    pairs.sort(key=lambda p: (-p[1], p[0]))
    pairs = pairs[:k]
    return pa.table(
        {
            "doc_id": pa.array([p[0] for p in pairs], type=pa.int64()),
            "score": pa.array([p[1] for p in pairs], type=pa.float64()),
            "rank": pa.array(range(1, len(pairs) + 1), type=pa.int32()),
        }
    )


def snippets_table(sf_dir: str, query: str, k: int = 10, width: int = 80) -> pa.Table:
    """Top-k hits with query-aware KWIC snippets (rounding-stable ranking).

    Text is fetched via lineage-pruned reads of the pages shards the index
    was built from (``query/snippets.fetch_texts``), so the cost is O(k)
    regardless of corpus size; snippet semantics are substring-find based
    and reproduced exactly by the SQL twin's ``strpos`` + ``substr``.
    """
    from ..query.snippets import fetch_texts, kwic_snippet

    s = DocumentsSearcher(sf_dir)
    pairs = [(d, round(sc, 6)) for d, sc in s.searcher.search(
        query, k=s.searcher.doc_count, method="exact"
    )]
    pairs.sort(key=lambda p: (-p[1], p[0]))
    pairs = pairs[:k]
    internal = [d for d, _ in pairs]
    texts = fetch_texts(s.searcher, internal)
    terms = s.searcher.preprocess_query(query)
    urls = s.searcher.lookup_urls(internal)
    positions, snips = [], []
    for d in internal:
        got = kwic_snippet(texts.get(d, ""), terms, width=width, mark=False)
        pos, snip = got if got else (0, "")
        positions.append(pos)
        snips.append(snip)
    return pa.table(
        {
            "doc_id": pa.array([int(urls[d]) for d in internal], type=pa.int64()),
            "rank": pa.array(range(1, len(internal) + 1), type=pa.int32()),
            "pos": pa.array(positions, type=pa.int64()),
            "snippet": pa.array(snips, type=pa.string()),
        }
    )


def orig_ids_streamed(searcher: Searcher, internal_sorted) -> "np.ndarray":
    """internal docIDs (SORTED uint64) → original doc_ids, streamed.

    One pass over the docs checkpoint with a sorted-array membership mask
    per batch — no match-set-sized ``is_in`` value set ever enters an Arrow
    filter expression, so the mapping stays bounded-memory even when a
    stop-word query matches most of the corpus."""
    import numpy as np

    out = np.empty(len(internal_sorted), dtype=np.int64)
    found = 0
    for rb in searcher._docs_ds.to_batches(
        columns=["doc_id", "url"], batch_size=65536
    ):
        ids = rb.column("doc_id").to_numpy().astype(np.uint64)
        if ids.size == 0:
            continue
        pos = np.searchsorted(internal_sorted, ids)
        pos[pos >= len(internal_sorted)] = len(internal_sorted) - 1
        hit = internal_sorted[pos] == ids
        if not hit.any():
            continue
        urls = rb.column("url").take(
            pa.array(np.flatnonzero(hit), type=pa.int64())
        ).to_pylist()
        out[pos[hit]] = [int(u) for u in urls]
        found += len(urls)
    if found != len(internal_sorted):
        raise KeyError("some internal docIDs are absent from the docs checkpoint")
    return out


class DocumentsSearcher:
    """Searcher over the documents corpus, reporting ORIGINAL doc_ids.

    The url IS the zero-padded original id, so internal→original mapping is
    ``int(url)`` on the (≤ result-sized) hit set — no driver-side full
    docID map (the docs table stays on disk, row-group pruned).
    """

    def __init__(self, sf_dir: str, index_dir: Path | None = None):
        # index_dir override: same corpus contract (url = zero-padded
        # original id) built through a different source path — e.g. the
        # WARC-sourced index (pipelines/web.py::warc_documents_index)
        self.index_dir = index_dir if index_dir is not None else documents_index(sf_dir)
        self.searcher = Searcher(self.index_dir)

    def _to_orig(self, results: list[tuple[int, float]]) -> list[tuple[int, float]]:
        if len(results) > 10_000:
            # match-set-sized hit lists (stop-word queries): streamed
            # sorted-membership mapping instead of a giant is_in value set
            import numpy as np

            ids = np.asarray([d for d, _ in results], dtype=np.uint64)
            order = np.argsort(ids)
            orig_sorted = orig_ids_streamed(self.searcher, ids[order])
            orig = np.empty_like(orig_sorted)
            orig[order] = orig_sorted
            return [(int(o), s) for o, (_, s) in zip(orig, results)]
        urls = self.searcher.lookup_urls([d for d, _ in results])
        return [(int(urls[d]), s) for d, s in results]

    def internal_ids(self, orig_ids: list[int]) -> dict[int, int]:
        """original doc_id → internal docID, via a pruned url lookup."""
        urls = [f"{o:020d}" for o in orig_ids]
        import pyarrow.compute as pc

        tbl = self.searcher._docs_ds.to_table(
            columns=["doc_id", "url"],
            filter=pc.field("url").isin(pa.array(urls, type=pa.string())),
        )
        return {
            int(u): int(d)
            for d, u in zip(tbl["doc_id"].to_pylist(), tbl["url"].to_pylist())
        }

    def scores(self, query: str) -> list[tuple[int, float]]:
        """All matching docs: [(original_doc_id, exact score)]."""
        results = self.searcher.search(query, k=self.searcher.doc_count)
        return self._to_orig(results)

    def topk(self, query: str, k: int = 10, method: str = "exact") -> list[tuple[int, float]]:
        return self._to_orig(self.searcher.search(query, k=k, method=method))


def bm25_scores_table(sf_dir: str, query: str) -> pa.Table:
    """(doc_id, score) for every doc matching the query — rounded to 6."""
    s = DocumentsSearcher(sf_dir)
    pairs = s.scores(query)
    pairs.sort(key=lambda p: p[0])
    return pa.table(
        {
            "doc_id": pa.array([p[0] for p in pairs], type=pa.int64()),
            "score": pa.array([round(p[1], 6) for p in pairs], type=pa.float64()),
        }
    )


def bm25_topk_table(sf_dir: str, query: str, k: int = 10) -> pa.Table:
    """Deterministic top-k by (rounded score desc, doc_id asc).

    Rounding before the cut keeps the boundary stable across engines whose
    float sums differ in the last bits (DuckDB SUM order is unspecified).
    """
    s = DocumentsSearcher(sf_dir)
    pairs = [(d, round(sc, 6)) for d, sc in s.scores(query)]
    pairs.sort(key=lambda p: (-p[1], p[0]))
    pairs = pairs[:k]
    return pa.table(
        {
            "doc_id": pa.array([p[0] for p in pairs], type=pa.int64()),
            "score": pa.array([p[1] for p in pairs], type=pa.float64()),
            "rank": pa.array(range(1, len(pairs) + 1), type=pa.int32()),
        }
    )


def bm25_stop_topk_table(
    sf_dir: str, query: str, stop_words: list, k: int = 10
) -> pa.Table:
    """Top-k over the STOPWORD-analyzed index: stop words never entered the
    postings (doc lengths and stats see the filtered stream) and are
    dropped from the query by the manifest-carried analyzer config."""
    s = DocumentsSearcher(
        sf_dir, index_dir=documents_index(sf_dir, stop_words=stop_words)
    )
    pairs = [(d, round(sc, 6)) for d, sc in s.scores(query)]
    pairs.sort(key=lambda p: (-p[1], p[0]))
    pairs = pairs[:k]
    return pa.table(
        {
            "doc_id": pa.array([p[0] for p in pairs], type=pa.int64()),
            "score": pa.array([p[1] for p in pairs], type=pa.float64()),
            "rank": pa.array(range(1, len(pairs) + 1), type=pa.int32()),
        }
    )


def synonym_topk_table(
    sf_dir: str, query: str, synonyms: dict[str, list[str]], k: int = 10
) -> pa.Table:
    """Query-time synonym expansion: each query term pulls its mapped
    synonyms into the scoring set (order-preserving dedup, standard
    MAX_QUERY_TERMS cap), then the plain exact scorer ranks — the
    analyzer-chain synonyms feature at query time (no reindex)."""
    from ..spec import MAX_QUERY_TERMS

    s = DocumentsSearcher(sf_dir)
    sr = s.searcher
    terms = sr.preprocess_query(query)
    expanded = list(
        dict.fromkeys(
            terms + [syn for t in terms for syn in synonyms.get(t, ())]
        )
    )[:MAX_QUERY_TERMS]
    if not expanded:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
                "rank": pa.array([], type=pa.int32()),
            }
        )
    ids, sc = sr._exact_scores(expanded, sr.term_chunks(expanded))
    pairs = [(d, round(float(x), 6)) for d, x in s._to_orig(list(zip(ids.tolist(), sc.tolist())))]
    pairs.sort(key=lambda p: (-p[1], p[0]))
    pairs = pairs[:k]
    return pa.table(
        {
            "doc_id": pa.array([p[0] for p in pairs], type=pa.int64()),
            "score": pa.array([p[1] for p in pairs], type=pa.float64()),
            "rank": pa.array(range(1, len(pairs) + 1), type=pa.int32()),
        }
    )


def bm25_topk_impact_table(sf_dir: str, query: str, k: int = 10) -> pa.Table:
    """Top-k via the Threshold-Algorithm scorer — same contract (and SQL
    twin) as ``bm25_topk_table``, but the ranking is produced by early
    termination over the impact-ordered layout instead of scoring the full
    candidate set.

    The oracle ranks by ROUNDED score; TA returns exact unrounded top-k'.
    The fetch grows until the rounded score of the worst fetched doc is
    strictly below the rounded k-th boundary: rounding is monotone, so any
    unfetched doc rounds to at most that value and can neither enter the
    rounded top-k nor tie its boundary — the cut is then provably exact,
    not heuristically padded.
    """
    idx_dir = documents_index(sf_dir, impact=True)
    searcher = Searcher(idx_dir)
    kk = max(4 * k, k + 16)
    while True:
        res = searcher.search(query, kk, method="impact")
        pairs = [(d, round(sc, 6)) for d, sc in res]
        pairs.sort(key=lambda p: (-p[1], p[0]))
        if len(res) < kk or len(pairs) <= k:
            break  # every matching doc fetched
        boundary = pairs[k - 1][1]
        if round(res[-1][1], 6) < boundary:
            break
        kk *= 4
    pairs = pairs[:k]
    urls = searcher.lookup_urls([d for d, _ in pairs])
    out = [(int(urls[d]), sc) for d, sc in pairs]
    return pa.table(
        {
            "doc_id": pa.array([p[0] for p in out], type=pa.int64()),
            "score": pa.array([p[1] for p in out], type=pa.float64()),
            "rank": pa.array(range(1, len(out) + 1), type=pa.int32()),
        }
    )


def doc_term_tf(sf_dir: str, tokenizer: str = "regex") -> ray.data.Dataset:
    """Tokenize-TF over documents: (doc_id, term, tf) rows."""
    from ..index.build import explode_postings
    from ..stages.tokenize import TokenizeDocs

    ds = documents_as_pages(sf_dir)
    ds = ds.map_batches(
        TokenizeDocs,
        fn_constructor_kwargs={"text_only": True, "tokenizer": tokenizer},
        batch_format="pyarrow",
        concurrency=2,
        zero_copy_batch=True,
    )

    def to_rows(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        terms = batch.column("terms")
        flat = pc.list_flatten(terms)
        parent = pc.list_parent_indices(terms)
        urls = pc.take(batch.column("url"), parent)
        doc_ids = pa.array(
            [int(u) for u in urls.to_pylist()], type=pa.int64()
        )
        return pa.table(
            {
                "doc_id": doc_ids,
                "term": flat,
                "tf": pc.cast(pc.list_flatten(batch.column("tfs")), pa.int64()),
            }
        )

    return ds.map_batches(to_rows, batch_format="pyarrow", zero_copy_batch=True)


def federated_documents_scores(sf_dir: str, query: str) -> pa.Table:
    """BM25 scores for ``query`` over TWO disjoint half-corpus indexes,
    merged by ``FederatedSearcher`` under global stats.

    The result must equal single-index BM25 over the whole corpus exactly
    (same oracle SQL as ``bm25_scores``) — the driver check therefore
    verifies the federation math, not just shapes.  Output: (doc_id, score)
    rounded 6, every matching doc.
    """
    from ..query.federate import FederatedSearcher

    src = f"{sf_dir}/documents.parquet"
    fp = file_fingerprint([src])
    from ..spec import INDEX_FORMAT_VERSION

    key = hashlib.sha1(f"fed|{fp}|v{INDEX_FORMAT_VERSION}".encode()).hexdigest()[:16]
    half_dirs = []
    n_docs = pq.ParquetFile(src).metadata.num_rows
    cut = n_docs // 2
    for half, pred in enumerate(
        (lambda d: d < cut, lambda d: d >= cut)
    ):
        idx_dir = _CACHE_ROOT / f"docs_fed_{key}_{half}"
        half_dirs.append(idx_dir)
        if (idx_dir / MANIFEST_NAME).exists():
            continue

        def pick(batch: pa.Table, _pred=pred) -> pa.Table:
            import pyarrow.compute as _pc

            ids = batch.column("url").to_pylist()
            keep = [_pred(int(u)) for u in ids]
            return batch.filter(pa.array(keep))

        pages = documents_as_pages(sf_dir).map_batches(
            pick, batch_format="pyarrow", zero_copy_batch=True
        )
        files = write_pages_shards(pages, idx_dir.parent / (idx_dir.name + "_pages"))
        cfg = BuildConfig(
            pre_extracted=True,
            text_only=True,
            num_waves=1,
            partitions_per_wave=4,
            shard_group_size=8,
            tokenize_concurrency=2,
        )
        build_index(files, idx_dir, cfg)
    fed = FederatedSearcher(half_dirs)
    res = fed.search(query, k=fed.doc_count, method="exact")
    need: dict[int, list[int]] = {}
    for idx, d, _ in res:
        need.setdefault(idx, []).append(d)
    urls = {
        idx: fed.searchers[idx].lookup_urls(sorted(ids))
        for idx, ids in need.items()
    }
    rows = sorted(
        (int(urls[idx][d]), round(sc, 6)) for idx, d, sc in res
    )
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "score": pa.array([r[1] for r in rows], type=pa.float64()),
        }
    )


def doc_df(sf_dir: str) -> ray.data.Dataset:
    """Document frequency per term: (term, df).

    Term cardinality = vocabulary size, so the count runs in coarse hash
    partitions (functions/groups.py), never a term-keyed Ray groupby.
    """
    import pandas as pd

    from ..functions.groups import coarse_grouped, str_pid

    def df_count(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("term", as_index=False).size()
        return out.rename(columns={"size": "df"})

    return coarse_grouped(
        doc_term_tf(sf_dir).select_columns(["term"]),
        lambda b: str_pid(b, "term", 64),
        df_count,
    )


def doc_stats(sf_dir: str) -> pa.Table:
    """Global corpus stats: (doc_count, avg_doc_len) — from the manifest."""
    s = DocumentsSearcher(sf_dir)
    return pa.table(
        {
            "doc_count": pa.array([s.searcher.doc_count], type=pa.int64()),
            "avg_doc_len": pa.array(
                [round(s.searcher.avg_doc_len, 6)], type=pa.float64()
            ),
        }
    )


def spell_suggest_table(sf_dir: str, words: list[str]) -> pa.Table:
    """Did-you-mean suggestions: for each input word, the highest-df
    dictionary term within Levenshtein distance 1 (``Searcher.suggest`` —
    the term itself wins at distance 0; ties df desc, term asc).  Words
    with no candidate are dropped (the twin's inner join does the same).

    df comes from the term-dictionary sidecar and equals
    COUNT(DISTINCT doc_id) (one posting per distinct term per doc — the
    same equivalence ``autocomplete`` pins)."""
    s = DocumentsSearcher(sf_dir)
    sr = s.searcher
    dictionary = sr._dictionary_terms()
    out_w, out_t, out_df = [], [], []
    for w in words:
        t = sr.suggest(w)
        if t is not None:
            out_w.append(w)
            out_t.append(t)
            out_df.append(dictionary[t])
    return pa.table(
        {
            "word": pa.array(out_w, type=pa.string()),
            "suggestion": pa.array(out_t, type=pa.string()),
            "df": pa.array(out_df, type=pa.int64()),
        }
    )


def mmr_topk_table(
    sf_dir: str, query: str, k: int = 5, n_cand: int = 20
) -> pa.Table:
    """Maximal-marginal-relevance diversified top-k (Carbonell & Goldstein
    '98): greedily pick argmax of ``0.5*rel + 0.5*(1 - max_sim_to_selected)``
    over the top ``n_cand`` BM25 candidates.

    Every quantity is cross-engine bit-exact by construction: rel is the
    6-rounded BM25 score; similarity is DISTINCT-TOKEN JACCARD — one IEEE
    division of two ints (identical in numpy and DuckDB, no rounding
    needed); λ=1/2 is dyadic; MAX is order-independent.  Ties → doc_id
    asc; the first pick's max-sim over the empty set is 0.

    The candidate fetch is the distributed part (exact scorer); the greedy
    loop is driver-side over n_cand² pairs — constant-sized by design (MMR
    is a head-of-ranking op, never corpus-scale)."""
    import re

    import pyarrow.compute as _pc
    import pyarrow.dataset as pads

    from ..spec import TOKEN_PATTERN

    s = DocumentsSearcher(sf_dir)
    pairs = [(d, round(sc, 6)) for d, sc in s.scores(query)]
    pairs.sort(key=lambda p: (-p[1], p[0]))
    pairs = pairs[:n_cand]
    ids = [d for d, _ in pairs]
    rel = {d: r for d, r in pairs}

    tok = re.compile(TOKEN_PATTERN)
    tbl = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "text"],
        filter=_pc.field("doc_id").isin(pa.array(ids, type=pa.int64())),
    )
    toksets = {
        int(d): set(tok.findall(t.lower()))
        for d, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
    }

    def sim(a: int, b: int) -> float:
        ta, tb = toksets[a], toksets[b]
        inter = len(ta & tb)
        if inter == 0:
            return 0.0
        return float(inter) / float(len(ta) + len(tb) - inter)

    selected: list[tuple[int, float]] = []
    remaining = list(ids)
    while remaining and len(selected) < k:
        best = None
        for d in remaining:
            ms = max((sim(d, sd) for sd, _ in selected), default=0.0)
            m = 0.5 * rel[d] + 0.5 * (1.0 - ms)
            key = (-m, d)
            if best is None or key < best[0]:
                best = (key, d, m)
        _, d, m = best
        selected.append((d, m))
        remaining.remove(d)
    return pa.table(
        {
            "rank": pa.array(range(1, len(selected) + 1), type=pa.int32()),
            "doc_id": pa.array([d for d, _ in selected], type=pa.int64()),
            "mmr": pa.array([m for _, m in selected], type=pa.float64()),
        }
    )


def search_after_table(
    sf_dir: str, query: str, k: int = 10, pages: int = 2
) -> pa.Table:
    """Cursor pagination (``search_after``): page N is the top-k of the
    candidates STRICTLY AFTER the previous page's last (score, doc_id)
    cursor in the (rounded score desc, doc_id asc) total order — the
    stateless deep-pagination discipline (no server-side scroll state; the
    cursor is the only thing a client carries between requests).

    Returns the LAST page, ranks (pages-1)*k+1 .. pages*k; the twin is the
    same ordering with OFFSET/LIMIT (equal by totality of the order)."""
    s = DocumentsSearcher(sf_dir)
    pairs = [(d, round(sc, 6)) for d, sc in s.scores(query)]
    pairs.sort(key=lambda p: (-p[1], p[0]))
    cursor: tuple[float, int] | None = None
    page: list[tuple[int, float]] = []
    for _ in range(pages):
        if cursor is None:
            page = pairs[:k]
        else:
            csc, cid = cursor
            page = [
                (d, sc)
                for d, sc in pairs
                if sc < csc or (sc == csc and d > cid)
            ][:k]
        if not page:
            break
        cursor = (page[-1][1], page[-1][0])
    base = (pages - 1) * k
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in page], type=pa.int64()),
            "score": pa.array([sc for _, sc in page], type=pa.float64()),
            "rank": pa.array(
                range(base + 1, base + 1 + len(page)), type=pa.int32()
            ),
        }
    )
