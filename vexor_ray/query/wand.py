"""Block-max WAND: rank-safe top-k over encoded posting chunks.

Doc-at-a-time evaluation with a bounded min-heap keyed ``(score, -docID)``
so the (score desc, docID asc) tie-break is preserved exactly.  Pruning uses
two levels of upper bounds, both conservative (never prune a doc whose true
score could reach the current heap threshold — skips happen only on strict
``<``, so boundary ties are always evaluated):

- per-cursor global bound = ``idf * max(block_ub)`` (idf-free block maxima
  are stored in the index; see ``codec.py``);
- block-max refinement at the pivot: ``idf * block_ub[block containing the
  pivot]`` summed over the lead cursors; on failure all lead cursors jump
  past the smallest current block boundary.

A salted (hot) term contributes one cursor per doc-range chunk; ranges are
disjoint so treating them as independent cursors only over-estimates bounds
(rank-safe).  Dense (stop-word-class) queries defeat pruning, and then
per-posting Python is strictly worse than vector math — the main loop
monitors its own skip rate and, when pruning is not paying, drains every
remaining posting in one vectorized exact-style pass (``_drain_remaining``;
rank-safe and bit-identical, proof in its docstring).  Scoring a pivot walks the query terms in query order and sums
contributions with plain Python float arithmetic in the reference's
association order — bit-identical to the exact scorer and the oracle.
"""

from __future__ import annotations

import heapq
import math

import numpy as np

from ..index import codec

_INF = 2**64  # > any docID


class _Cursor:
    __slots__ = (
        "term_idx",
        "chunk_idx",
        "chunk",
        "idf",
        "max_score",
        "block",
        "pos",
        "docs",
        "tfs",
        "dls",
        "cur_doc",
        "n_blocks",
    )

    def __init__(self, term_idx: int, chunk: dict, idf: float, chunk_idx: int = 0):
        self.term_idx = term_idx
        self.chunk_idx = chunk_idx  # position in the term's chunk list
        self.chunk = chunk
        self.idf = idf
        self.n_blocks = len(chunk["block_last"])
        self.max_score = idf * float(chunk["block_ub"].max()) if self.n_blocks else 0.0
        self.block = -1
        self.pos = 0
        self.docs = self.tfs = self.dls = None
        self.cur_doc = _INF
        if self.n_blocks:
            self._load_block(0)
            self.cur_doc = int(self.docs[0])

    def _load_block(self, b: int) -> None:
        self.block = b
        self.docs, self.tfs, self.dls = codec.decode_block(self.chunk, b)
        self.pos = 0

    def block_info(self, doc: int) -> tuple[float, int]:
        """(upper bound, last docID) of the block that would contain ``doc``.

        The block b = first block with ``block_last[b] >= doc`` spans
        ``[block_last[b-1]+1, block_last[b]]`` ⊇ ``[doc, block_last[b]]``,
        so the returned ub bounds every doc from ``doc`` to the boundary.
        """
        b = int(np.searchsorted(self.chunk["block_last"], doc))
        if b >= self.n_blocks:
            return 0.0, _INF
        return self.idf * float(self.chunk["block_ub"][b]), int(
            self.chunk["block_last"][b]
        )

    def next_geq(self, target: int) -> int:
        if self.cur_doc >= target:
            return self.cur_doc
        b = int(np.searchsorted(self.chunk["block_last"], target))
        if b >= self.n_blocks:
            self.cur_doc = _INF
            return _INF
        if b != self.block:
            self._load_block(b)
        self.pos = int(np.searchsorted(self.docs, target))
        # block_last[b] >= target guarantees pos < len(docs)
        self.cur_doc = int(self.docs[self.pos])
        return self.cur_doc

    def advance(self) -> int:
        self.pos += 1
        if self.pos >= self.docs.size:
            if self.block + 1 >= self.n_blocks:
                self.cur_doc = _INF
                return _INF
            self._load_block(self.block + 1)
        self.cur_doc = int(self.docs[self.pos])
        return self.cur_doc

    def score_current(self, k1: float, b: float, avg_doc_len: float) -> float:
        tf = float(self.tfs[self.pos])
        dl = float(self.dls[self.pos])
        denominator = tf + k1 * (1.0 - b + b * dl / avg_doc_len)
        return self.idf * tf * (k1 + 1.0) / denominator


# adaptive drain: every _DRAIN_CHECK main-loop iterations, if block-max
# pruning skipped fewer than _DRAIN_MIN_SKIP of pivots, the query is dense
# (stop-word-class) and per-posting Python cannot win — finish it with one
# vectorized exact-style pass over the remaining postings (rank-safe, see
# _drain_remaining)
_DRAIN_CHECK = 256
# Drain unless pruning skips MOST pivots: the vectorized drain costs about
# one exact-scorer pass over the remaining postings (ms), while the cursor
# walk pays Python per posting — at skip rates below ~½ the walk can't win.
# Truly selective queries either finish before the first check or keep
# skip-rates well above the bar (the case WAND exists for).
_DRAIN_MIN_SKIP = 0.5


def _drain_remaining(
    cursors: list[_Cursor],
    heap: list[tuple[float, int]],
    *,
    n_terms: int,
    k: int,
    k1: float,
    b: float,
    avg_doc_len: float,
    tail_lookup=None,
) -> None:
    """Score every remaining (unconsumed) posting vectorized, update heap.

    Rank-safety: a doc with SOME postings already consumed was jumped past
    only under a strict block-max/ub proof that its full score is < the
    then-threshold; thresholds only rise, so the partial score computed here
    (≤ the full score) can never displace a heap entry — and every doc with
    no posting consumed gets its exact full score, accumulated per term in
    query order with the same float association as the exact scorer
    (bit-identical results).
    """
    per_term: list[list[tuple[float, np.ndarray, np.ndarray, np.ndarray]]] = [
        [] for _ in range(n_terms)
    ]
    all_docs = []
    for c in cursors:
        if c.cur_doc >= _INF:
            continue
        tail = tail_lookup(c) if tail_lookup is not None else None
        if tail is not None:
            # cached full-chunk decode (searcher postings cache): slice the
            # unconsumed suffix — repeats of dense queries skip decode
            d, t, l = tail
        else:
            docs = [c.docs[c.pos :]]
            tfs = [c.tfs[c.pos :]]
            dls = [c.dls[c.pos :]]
            if c.block + 1 < c.n_blocks:
                # bulk tail decode: one varint pass instead of one per block
                td, tt, tl = codec.decode_tail(c.chunk, c.block + 1)
                docs.append(td)
                tfs.append(tt)
                dls.append(tl)
            d = np.concatenate(docs)
            t = np.concatenate(tfs)
            l = np.concatenate(dls)
        per_term[c.term_idx].append((c.idf, d, t, l))
        all_docs.append(d)
        c.cur_doc = _INF  # consumed
    if not all_docs:
        return
    uniq = np.unique(np.concatenate(all_docs))
    acc: np.ndarray | None = None
    for ti in range(n_terms):
        if not per_term[ti]:
            continue
        part = np.zeros(uniq.size)
        for idf, d, tf, dl in per_term[ti]:
            # same expression/association order as Searcher._exact_scores
            tf = tf.astype(np.float64)
            dl = dl.astype(np.float64)
            denom = tf + k1 * ((1.0 - b) + (b * dl) / avg_doc_len)
            # salted chunks of one term cover disjoint doc ranges, so plain
            # assignment (not +=) is exact
            part[np.searchsorted(uniq, d)] = (idf * tf) * (k1 + 1.0) / denom
        acc = part if acc is None else acc + part
    if acc is None:
        return
    order = np.lexsort((uniq, -acc))
    for i in order:
        key = (float(acc[i]), -int(uniq[i]))
        if len(heap) < k:
            heapq.heappush(heap, key)
        elif key > heap[0]:
            heapq.heapreplace(heap, key)
        else:
            break  # keys descend in (score desc, docID asc): none left can enter


def block_max_wand(
    terms: list[str],
    chunks_by_term: dict[str, list[dict]],
    *,
    doc_count: int,
    avg_doc_len: float,
    k: int,
    k1: float,
    b: float,
    df_by_term: dict[str, int] | None = None,
    decoded_provider=None,
) -> list[tuple[int, float]]:
    """Top-k ``[(doc_id, score)]`` — rank-identical to the exact scorer.

    ``df_by_term`` overrides per-term document frequency with global values
    (federated querying across disjoint indexes).  ``decoded_provider``
    (optional): ``fn(chunks, term) -> [(salt, docs, tf_f64, denom_base,
    dl_f64)]`` per chunk — the searcher's cached raw decode; when present
    the adaptive drain slices cached arrays instead of re-decoding blobs,
    so repeated dense queries cost vector math only.
    """
    if k <= 0 or doc_count <= 0 or avg_doc_len <= 0:
        return []
    cursors: list[_Cursor] = []
    for ti, term in enumerate(terms):
        chunks = chunks_by_term.get(term, [])
        df = (
            df_by_term[term]
            if df_by_term is not None
            else sum(c["n_postings"] for c in chunks)
        )
        if df == 0:
            continue
        idf = math.log((doc_count - df + 0.5) / (df + 0.5) + 1.0)
        for ci, chunk in enumerate(chunks):
            if chunk["n_postings"]:
                cursors.append(_Cursor(ti, chunk, idf, chunk_idx=ci))
    if not cursors:
        return []

    def _tail_lookup(c: _Cursor):
        """Unconsumed suffix of c's chunk from the provider cache, or None."""
        if decoded_provider is None:
            return None
        bs = c.chunk.get("block_size")
        if not bs:
            return None  # unknown block length → can't map (block, pos)
        term = terms[c.term_idx]
        parts = decoded_provider(chunks_by_term.get(term, []), term)
        if parts is None or c.chunk_idx >= len(parts):
            return None
        _salt, docs, tf_f, _denom_base, dl_f = parts[c.chunk_idx]
        gpos = c.block * bs + c.pos
        return docs[gpos:], tf_f[gpos:], dl_f[gpos:]

    n_terms = len(terms)
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k

    def threshold() -> float:
        return heap[0][0] if len(heap) == k else -math.inf

    # iteration budget: the vectorized drain costs ~one pass over the
    # remaining postings, so once the Python walk has spent iterations on
    # the order of total_postings/8 it cannot recoup — even at a passable
    # pivot-prune rate (a prune only pays when it jumps MANY postings)
    total_postings = sum(c.chunk["n_postings"] for c in cursors)
    iter_budget = max(2048, total_postings // 8)
    n_iters = 0
    n_pruned = 0
    while True:
        n_iters += 1
        if n_iters % _DRAIN_CHECK == 0 and (
            n_pruned < _DRAIN_MIN_SKIP * n_iters or n_iters > iter_budget
        ):
            # pruning is not paying: finish vectorized (rank-safe)
            _drain_remaining(
                cursors,
                heap,
                n_terms=len(terms),
                k=k,
                k1=k1,
                b=b,
                avg_doc_len=avg_doc_len,
                tail_lookup=_tail_lookup,
            )
            break
        live = [c for c in cursors if c.cur_doc < _INF]
        if not live:
            break
        live.sort(key=lambda c: c.cur_doc)
        # ---- pivot selection (global upper bounds) ----
        thr = threshold()
        acc = 0.0
        pivot_idx = -1
        for i, c in enumerate(live):
            acc += c.max_score
            if acc >= thr:
                pivot_idx = i
                break
        if pivot_idx < 0:
            break  # no doc can reach the threshold
        pivot_doc = live[pivot_idx].cur_doc
        # include all cursors positioned exactly at the pivot doc
        while pivot_idx + 1 < len(live) and live[pivot_idx + 1].cur_doc == pivot_doc:
            pivot_idx += 1
        lead = live[: pivot_idx + 1]

        # ---- block-max refinement ----
        infos = [c.block_info(pivot_doc) for c in lead]
        bm_sum = sum(ub for ub, _ in infos)
        if bm_sum < thr:
            n_pruned += 1
            # the per-pivot-block bounds hold for every doc from pivot_doc
            # to the smallest block boundary; never jump past the first
            # non-lead cursor's doc (its contribution was not in the bound)
            boundary = min(bnd for _, bnd in infos)
            target = min(boundary, _INF - 1) + 1
            if pivot_idx + 1 < len(live):
                target = min(target, live[pivot_idx + 1].cur_doc)
            target = max(target, pivot_doc + 1)
            for c in lead:
                c.next_geq(target)
            continue

        if lead[0].cur_doc == pivot_doc:
            # all lead cursors aligned on the pivot: score it fully,
            # summing per-term contributions in query order (float parity)
            contribs = [0.0] * n_terms
            seen_terms = []
            for c in lead:
                if c.cur_doc == pivot_doc:
                    contribs[c.term_idx] = c.score_current(k1, b, avg_doc_len)
                    seen_terms.append(c.term_idx)
            score = 0.0
            for ti in sorted(set(seen_terms)):
                score += contribs[ti]
            key = (score, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, key)
            elif key > heap[0]:
                heapq.heapreplace(heap, key)
            for c in lead:
                if c.cur_doc == pivot_doc:
                    c.advance()
        else:
            # advance the lagging cursor with the largest bound (classic pick)
            lag = max(
                (c for c in lead if c.cur_doc < pivot_doc),
                key=lambda c: c.max_score,
            )
            lag.next_geq(pivot_doc)

    ranked = sorted(heap, key=lambda t: (-t[0], -t[1]))
    return [(-nd, s) for s, nd in ranked]
