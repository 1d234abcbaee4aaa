"""Multi-index federation: one BM25 query over a union of disjoint indexes.

The reference selects ONE cache per query among many
(``vexor/services/search_service.py:999-1061``); this layer goes further and
queries the UNION — the doc-partitioned serving story at cluster scale: each
index shard holds a disjoint slice of the corpus, a query fans out to every
shard, and results merge under GLOBAL corpus statistics (union doc_count,
union avgdl, summed per-term df), so scores are bit-identical to a single
index built over the concatenated corpus (verified by
``tests/test_federate.py``).

Rank safety: the exact arm scores every matching doc per shard under global
stats; the WAND arm runs per shard with global df/doc_count/avgdl (bounds
stay conservative) and the driver keeps the global top-k.  Ties break by
(score desc, shard index asc, docID asc) — the lineage docID order extended
across shards.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .searcher import Searcher


class FederatedSearcher:
    """Query executor over several committed index directories."""

    def __init__(
        self,
        index_dirs: list[str | Path],
        *,
        max_dense_docs: int | None = None,
        filesystem=None,
    ):
        if not index_dirs:
            raise ValueError("need at least one index directory")
        # entries may be local paths, Stores, plain paths on an explicit
        # shared filesystem — the 100 TB shape is N object-store shards —
        # or pre-built Searcher instances (e.g. pinned to a retained
        # snapshot via Searcher(manifest_name=...): snapshot-aware
        # federation for consistent cross-shard serving)
        self.searchers = [
            d
            if isinstance(d, Searcher)
            else Searcher(d, max_dense_docs=max_dense_docs, filesystem=filesystem)
            for d in index_dirs
        ]
        cfg0 = self.searchers[0].manifest["config"]
        for s in self.searchers[1:]:
            cfg = s.manifest["config"]
            for key in ("k1", "b", "tokenizer", "token_pattern", "doc_builder",
                        "text_only", "stop_words", "bpe_merges"):
                if cfg.get(key) != cfg0.get(key):
                    raise ValueError(
                        f"federated indexes disagree on {key!r}: "
                        f"{cfg.get(key)!r} vs {cfg0.get(key)!r}"
                    )
        # LIVE member stats: a member with pending deletions contributes its
        # complement counts, so the union scores equal one physical index
        # over the union of live corpora
        self._any_tombs = any(s._has_tombs for s in self.searchers)
        self.doc_count = sum(s.live_doc_count for s in self.searchers)
        total_len = sum(s.live_total_doc_len for s in self.searchers)
        self.avg_doc_len = total_len / self.doc_count if self.doc_count else 0.0

    def preprocess_query(self, query: str) -> list[str]:
        return self.searchers[0].preprocess_query(query)

    def _global_dfs(
        self, terms: list[str], chunks_per_index: list[dict]
    ) -> dict[str, int]:
        out: dict[str, int] = {}
        for t in terms:
            n = 0
            for s, chunks in zip(self.searchers, chunks_per_index):
                cl = chunks.get(t, [])
                if not cl:
                    continue
                if s._has_tombs:
                    # live df needs the decode-time tombstone mask; the
                    # decoded payload is cached, so the exact arm (forced
                    # below for tombstoned members) reuses it for free
                    if s._sharded:
                        n += sum(
                            int(p[1].size) for p in s._term_postings_raw(cl, t)
                        )
                    else:
                        n += int(s._term_postings(cl, t)[0].size)
                else:
                    n += sum(c["n_postings"] for c in cl)
            out[t] = n
        return out

    def df(self, term: str) -> int:
        return sum(s.df(term) for s in self.searchers)

    def search(
        self, query: str, k: int = 10, method: str = "auto"
    ) -> list[tuple[int, int, float]]:
        """Global top-k ``[(index_id, doc_id, score)]``.

        Scores equal a single index over the concatenated corpus exactly
        (same per-doc float association order under global stats).
        """
        terms = self.preprocess_query(query)
        if not terms or self.doc_count == 0 or self.avg_doc_len <= 0:
            return []
        chunks_per_index = [s.term_chunks(terms) for s in self.searchers]
        dfs = self._global_dfs(terms, chunks_per_index)
        if self._any_tombs:
            # pending deletions: only the exact arm masks tombstoned
            # postings (same rule as Searcher.search)
            if method == "wand":
                raise ValueError(
                    "a federated member has pending deletions; WAND needs "
                    "physical indexes — purge/compact the member, or use "
                    "method='exact'"
                )
            method = "exact"
        if method == "auto":
            total = sum(dfs.values())
            method = (
                "wand"
                if total <= Searcher.AUTO_WAND_MAX_POSTINGS
                else "exact"
            )
        merged: list[tuple[float, int, int]] = []  # (-score, idx, doc)
        for idx, (s, chunks) in enumerate(zip(self.searchers, chunks_per_index)):
            if method == "wand":
                # shard block_ub was encoded under the shard's own avgdl;
                # scoring under the (larger) union avgdl can exceed it, so
                # rescale by the avgdl ratio — conservative because the BM25
                # tf component is monotone in avgdl with ratio <= avg ratio.
                # Copies, never mutates: chunk dicts are LRU-cached.
                scale = (
                    max(1.0, self.avg_doc_len / s.avg_doc_len)
                    if s.avg_doc_len > 0
                    else 1.0
                )
                if scale != 1.0:
                    chunks = {
                        t: [
                            {**c, "block_ub": c["block_ub"] * np.float32(scale)}
                            for c in cl
                        ]
                        for t, cl in chunks.items()
                    }
            if method == "exact":
                doc_ids, scores = s._exact_scores(
                    terms,
                    chunks,
                    doc_count=self.doc_count,
                    avg_doc_len=self.avg_doc_len,
                    df_by_term=dfs,
                )
                local = s._top_k(doc_ids, scores, k)
            else:
                from .wand import block_max_wand

                local = block_max_wand(
                    terms,
                    chunks,
                    doc_count=self.doc_count,
                    avg_doc_len=self.avg_doc_len,
                    k=k,
                    k1=s.k1,
                    b=s.b,
                    df_by_term=dfs,
                    # drain recomputes denominators from dl under the UNION
                    # avgdl, so the per-index cached decode stays valid here
                    decoded_provider=s._wand_tail_provider,
                )
            merged.extend((-sc, idx, d) for d, sc in local)
        merged.sort()
        return [(idx, d, -ns) for ns, idx, d in merged[:k]]

    def search_hits(self, queries: list[dict], method: str = "auto"):
        """Query set → hits table with (query_id, rank, index_id, doc_id,
        url, score)."""
        import pyarrow as pa

        rows = {"query_id": [], "rank": [], "index_id": [], "doc_id": [],
                "url": [], "score": []}
        need: dict[int, set[int]] = {}
        results = []
        for q in queries:
            res = self.search(q["query"], q.get("k", 10), method=method)
            results.append((q, res))
            for idx, d, _ in res:
                need.setdefault(idx, set()).add(d)
        urls = {
            idx: self.searchers[idx].lookup_urls(sorted(ids))
            for idx, ids in need.items()
        }
        for q, res in results:
            for rank, (idx, d, sc) in enumerate(res, start=1):
                rows["query_id"].append(q.get("query_id"))
                rows["rank"].append(rank)
                rows["index_id"].append(idx)
                rows["doc_id"].append(d)
                rows["url"].append(urls[idx].get(d))
                rows["score"].append(sc)
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "rank": pa.array(rows["rank"], type=pa.int32()),
                "index_id": pa.array(rows["index_id"], type=pa.int32()),
                "doc_id": pa.array(rows["doc_id"], type=pa.uint64()),
                "url": pa.array(rows["url"], type=pa.string()),
                "score": pa.array(rows["score"], type=pa.float64()),
            }
        )
