"""KWIC (keyword-in-context) snippets for search hits.

Display layer the reference approximates with its stored 160-char preview
(``vexor/modes.py:318-331``): here the snippet is QUERY-AWARE — a window
of the document text centered on the first occurrence of any query term —
and the text is fetched on demand from the ORIGINAL pages input via
lineage docIDs (``doc_id = (file_idx << 32) | row``), reading only the
parquet row groups that contain the hit rows.  Nothing document-scale ever
reaches the driver: the fetch cost is O(k hits), independent of corpus
size.

Snippet semantics are deliberately substring-find based (``text.lower()
.find(term)``, first match across terms in query order wins the earliest
position) so a SQL twin can reproduce them exactly with
``strpos(lower(text), term)`` + ``substr`` — token-aligned highlighting is
cosmetic on top (``mark=True`` wraps matched terms, engine-side only).
"""

from __future__ import annotations

import re

import pyarrow.parquet as pq


def kwic_snippet(
    text: str, terms: list[str], width: int = 80, mark: bool = False
) -> tuple[int, str] | None:
    """(position, snippet) for the earliest occurrence of any term.

    ``position`` is the 1-based character index of the first match
    (the value ``strpos`` returns in SQL); the snippet is
    ``substr(text, max(1, position - width), 2 * width)`` — computed with
    identical code-point arithmetic on both sides.  Returns None when no
    term occurs as a substring.
    """
    low = text.lower()
    best = -1
    for t in terms:
        p = low.find(t)
        if p >= 0 and (best < 0 or p < best):
            best = p
    if best < 0:
        return None
    start = max(0, best - width)
    snippet = text[start : start + 2 * width]
    if mark:
        pat = re.compile(
            "(" + "|".join(re.escape(t) for t in sorted(terms, key=len, reverse=True)) + ")",
            re.IGNORECASE,
        )
        snippet = pat.sub(lambda m: f"«{m.group(0)}»", snippet)
    return best + 1, snippet


def fetch_texts(searcher, doc_ids: list[int]) -> dict[int, str]:
    """doc_id → document text via lineage-pruned reads of the pages input.

    Lineage docIDs encode (file index, row): rows are grouped per input
    file and only the parquet ROW GROUPS covering the requested rows are
    read — O(hits) IO.  html inputs go through the shared byte-exact
    extractor; pre-extracted inputs through the same normalization the
    build applied, so the text matches what was indexed.
    """
    from ..refimpl.textnorm import extract_text, normalize_text

    cfg = searcher.manifest["config"]
    pre = bool(cfg.get("pre_extracted"))
    files = searcher.manifest["input_files"]
    by_file: dict[int, list[int]] = {}
    for d in doc_ids:
        by_file.setdefault(int(d) >> 32, []).append(int(d) & 0xFFFFFFFF)
    out: dict[int, str] = {}
    col = "text" if pre else "html"
    for fi, rows in by_file.items():
        if searcher._fs is None:
            pf = pq.ParquetFile(files[fi])
        else:
            pf = pq.ParquetFile(searcher._fs.open_input_file(files[fi]))
        # map rows → row groups via cumulative counts; read each group once
        bounds = [0]
        for rg in range(pf.metadata.num_row_groups):
            bounds.append(bounds[-1] + pf.metadata.row_group(rg).num_rows)
        need: dict[int, list[int]] = {}
        for r in rows:
            rg = next(i for i in range(len(bounds) - 1) if bounds[i] <= r < bounds[i + 1])
            need.setdefault(rg, []).append(r)
        for rg, rs in need.items():
            tbl = pf.read_row_group(rg, columns=[col])
            vals = tbl.column(col).to_pylist()
            for r in rs:
                raw = vals[r - bounds[rg]]
                if pre:
                    text = normalize_text(raw or "")
                else:
                    text = extract_text(raw) or ""
                out[(fi << 32) | r] = text
    return out


def search_snippets(
    searcher,
    query: str,
    k: int = 10,
    width: int = 80,
    mark: bool = True,
    method: str = "auto",
) -> list[dict]:
    """Top-k hits with query-aware snippets:
    ``[{doc_id, score, position, snippet}]`` (position 0 / preview-less
    when no query term occurs verbatim — e.g. a Bert-path subword match).
    """
    hits = searcher.search(query, k, method=method)
    if not hits:
        return []
    terms = searcher.preprocess_query(query)
    texts = fetch_texts(searcher, [d for d, _ in hits])
    out = []
    for d, sc in hits:
        got = kwic_snippet(texts.get(d, ""), terms, width=width, mark=mark)
        pos, snip = got if got else (0, "")
        out.append({"doc_id": d, "score": sc, "position": pos, "snippet": snip})
    return out
