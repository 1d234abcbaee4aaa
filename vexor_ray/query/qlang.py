"""Mini query language over the engine's retrieval primitives.

Syntax (one line, whitespace-separated):

- ``term``       — scoring term (BM25 OR semantics)
- ``+term``      — must contain (filter + scoring)
- ``-term``      — must not contain (filter)
- ``"a b c"``    — must contain the exact phrase (positions sidecar);
                   the phrase's words also join the scoring terms
- ``"a b"~5``    — proximity: the two words must occur within 5 tokens
                   of each other, either order (positions sidecar);
                   exactly two words per proximity clause
- ``pre*``       — prefix wildcard: every corpus term starting with
                   ``pre`` joins the scoring terms (term dictionary)
- ``*suf``       — suffix wildcard: corpus terms ending with ``suf``
                   (one vectorized dictionary scan)
- ``*mid*``      — contains wildcard: corpus terms containing ``mid``
- ``term~``      — fuzzy: corpus terms within edit distance 1 join the
                   scoring terms (term dictionary)

Everything composes onto existing, individually-oracle-checked
primitives: the exact scorer (`Searcher._exact_scores` via
``search_boolean``), dictionary expansion (``expand_prefix`` /
``expand_fuzzy``), and positional phrase matching
(``PositionsIndex.phrase_occurrences``).  Ranking is (score desc, docID
asc) over the live corpus — tombstone deletions apply throughout.

The reference has no query language (its query is an embedding string;
``vexor/bm25.py`` scores literal tokens).  This is the web-search surface
a full-text engine is normally driven through.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_QUOTED = re.compile(r'"([^"]*)"(?:~(\d+))?')


@dataclass
class ParsedQuery:
    should: list[str] = field(default_factory=list)
    must: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    phrases: list[str] = field(default_factory=list)
    nears: list[tuple[str, int]] = field(default_factory=list)  # (words, window)
    prefixes: list[str] = field(default_factory=list)
    suffixes: list[str] = field(default_factory=list)
    contains: list[str] = field(default_factory=list)
    fuzzies: list[str] = field(default_factory=list)


def parse_query(query: str) -> ParsedQuery:
    """Parse the mini language (see module docstring).  Raw word text is
    NOT normalized here — callers tokenize each captured word with the
    index's own tokenizer so normalization matches the postings."""
    p = ParsedQuery()

    def grab_phrase(m: re.Match) -> str:
        body = m.group(1).strip()
        if body:
            if m.group(2) is not None:
                p.nears.append((body, int(m.group(2))))
            else:
                p.phrases.append(body)
        return " "

    rest = _QUOTED.sub(grab_phrase, query)
    for raw in rest.split():
        neg = raw.startswith("-")
        pos = raw.startswith("+")
        word = raw[1:] if (neg or pos) else raw
        if not word:
            continue
        if word.startswith("*") and word.endswith("*") and len(word) > 2:
            p.contains.append(word[1:-1])
        elif word.startswith("*") and len(word) > 1:
            p.suffixes.append(word[1:])
        elif word.endswith("*") and len(word) > 1:
            p.prefixes.append(word[:-1])
        elif word.endswith("~") and len(word) > 1:
            p.fuzzies.append(word[:-1])
        elif neg:
            p.must_not.append(word)
        elif pos:
            p.must.append(word)
        else:
            p.should.append(word)
    return p


def search_query(
    searcher,
    query: str,
    k: int = 10,
    *,
    positions=None,
    max_expand_per_token: int = 64,
) -> list[tuple[int, float]]:
    """Execute a mini-language query against a ``Searcher`` (+ optional
    ``PositionsIndex`` for phrase clauses).

    Scoring terms = must + bare + phrase words + prefix expansions
    (lexicographic) + fuzzy expansions (lexicographic), order-preserving
    dedup, capped like ``preprocess_query``; filters are the boolean
    must/must_not plus per-phrase containment.  Deterministic end to end.
    """
    p = parse_query(query)
    if (p.phrases or p.nears) and positions is None:
        raise ValueError(
            'query contains a "phrase"/proximity clause but no positions '
            "index was given"
        )
    tok = searcher.preprocess_query
    must = [t for w in p.must for t in tok(w)]
    must_not = [t for w in p.must_not for t in tok(w)]
    scoring = list(must)
    for w in p.should:
        scoring.extend(tok(w))
    for ph in p.phrases:
        scoring.extend(tok(ph))
    near_pairs: list[tuple[str, str, int]] = []
    for body, window in p.nears:
        toks = tok(body)
        if len(toks) != 2:
            raise ValueError(
                f'proximity clause "{body}"~{window} must contain exactly '
                f"two words (got {len(toks)})"
            )
        near_pairs.append((toks[0], toks[1], window))
        scoring.extend(toks)
    for pre in p.prefixes:
        for t in tok(pre):
            scoring.extend(searcher.expand_prefix(t, max_expand_per_token))
    for suf in p.suffixes:
        for t in tok(suf):
            scoring.extend(searcher.expand_suffix(t, max_expand_per_token))
    for mid in p.contains:
        for t in tok(mid):
            scoring.extend(searcher.expand_contains(t, max_expand_per_token))
    for fz in p.fuzzies:
        for t in tok(fz):
            scoring.extend(searcher.expand_fuzzy(t, max_expand_per_token))
    from ..spec import MAX_QUERY_TERMS

    scoring = list(dict.fromkeys(scoring))[:MAX_QUERY_TERMS]
    if not scoring:
        return []
    want_all = bool(p.phrases or near_pairs)
    res = searcher.search_boolean(
        must=must,
        should=[t for t in scoring if t not in set(must)],
        must_not=must_not,
        k=searcher.live_doc_count if want_all else k,
    )
    if (p.phrases or near_pairs) and res:
        import numpy as np

        keep_ids = None
        tomb = searcher._tombstones()
        occ_tables = [
            positions.phrase_occurrences(ph, deleted_doc_ids=tomb)
            for ph in p.phrases
        ] + [
            positions.near_occurrences(a, b, w, deleted_doc_ids=tomb)
            for a, b, w in near_pairs
        ]
        for occ in occ_tables:
            ids = occ.column("doc_id").to_numpy().astype(np.uint64)
            ids = np.unique(ids)
            keep_ids = (
                ids if keep_ids is None else np.intersect1d(keep_ids, ids)
            )
            if keep_ids.size == 0:
                return []
        doc_arr = np.asarray([d for d, _ in res], dtype=np.uint64)
        pos = np.searchsorted(keep_ids, doc_arr)
        pos[pos >= keep_ids.size] = keep_ids.size - 1
        live = keep_ids[pos] == doc_arr
        res = [r for r, ok in zip(res, live) if ok]
    return res[:k]
