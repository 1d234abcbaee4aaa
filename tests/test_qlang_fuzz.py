"""Differential fuzzing of the query language.

Thirty seeded random mini-language queries (bare/+/-/phrase/proximity/
prefix/suffix/contains/fuzzy clauses over real corpus vocabulary) executed
by ``search_query`` must equal an INDEPENDENT evaluator built on the
pure-Python oracle postings and the positions ground truth — exercising
clause interaction (expansion + filters + ranking) far beyond the
hand-written per-clause tests.  Scores compare exactly: the exact scorer
is bit-identical to ``refimpl.score_postings`` by the repo's core
rank-identity contract.
"""

from __future__ import annotations

import random

from vexor_ray.query.qlang import parse_query, search_query
from vexor_ray.query.searcher import Searcher
from vexor_ray.refimpl.bm25 import score_postings, tokenize
from vexor_ray.spec import MAX_QUERY_TERMS

MAX_EXPAND = 64


def _lev1(a: str, b: str) -> bool:
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b is a with one insertion
    i = j = 0
    used = False
    while i < la and j < lb:
        if a[i] == b[j]:
            i += 1
            j += 1
        elif not used:
            used = True
            j += 1
        else:
            return False
    return True


def _eval(query, oracle, pos_oracle):
    """Independent mirror of search_query's documented semantics."""
    p = parse_query(query)
    vocab = oracle.postings
    df = {t: len(ps) for t, ps in vocab.items()}

    must = [t for w in p.must for t in tokenize(w)]
    must_not = [t for w in p.must_not for t in tokenize(w)]
    scoring = list(must)
    for w in p.should:
        scoring += tokenize(w)
    for ph in p.phrases:
        scoring += tokenize(ph)
    near_pairs = []
    for body, win in p.nears:
        ts = tokenize(body)
        assert len(ts) == 2
        near_pairs.append((ts[0], ts[1], win))
        scoring += ts

    def _cap_lex(hits):
        hits = sorted(hits)
        return hits[:MAX_EXPAND]

    for pre in p.prefixes:
        for t in tokenize(pre):
            scoring += _cap_lex(v for v in vocab if v.startswith(t))
    for suf in p.suffixes:
        for t in tokenize(suf):
            scoring += _cap_lex(v for v in vocab if v.endswith(t))
    for mid in p.contains:
        for t in tokenize(mid):
            scoring += _cap_lex(v for v in vocab if t in v)
    for fz in p.fuzzies:
        for t in tokenize(fz):
            cand = sorted(v for v in vocab if _lev1(t, v))
            if len(cand) > MAX_EXPAND:
                cand = sorted(cand, key=lambda v: (-df[v], v))[:MAX_EXPAND]
                cand.sort()
            scoring += cand
    scoring = list(dict.fromkeys(scoring))[:MAX_QUERY_TERMS]
    if not scoring:
        return []
    for t in must:
        if t not in vocab:
            return []
    scores = score_postings(
        scoring, vocab, oracle.doc_count, oracle.avg_doc_len
    )

    def has(t, d):
        return any(p_[0] == d for p_ in vocab.get(t, ()))

    docs = [
        d
        for d in scores
        if all(has(t, d) for t in must)
        and not any(has(t, d) for t in must_not)
    ]
    if p.phrases or near_pairs:

        def phrase_ok(d, toks):
            seq = pos_oracle.get(d)
            if seq is None:
                return False
            n = len(toks)
            return any(
                seq[i : i + n] == toks for i in range(len(seq) - n + 1)
            )

        def near_ok(d, a, b, w):
            seq = pos_oracle.get(d)
            if seq is None:
                return False
            pa_ = [i for i, t in enumerate(seq) if t == a]
            pb_ = [i for i, t in enumerate(seq) if t == b]
            return any(abs(i - j) <= w for i in pa_ for j in pb_)

        docs = [
            d
            for d in docs
            if all(phrase_ok(d, tokenize(ph)) for ph in p.phrases)
            and all(near_ok(d, a, b, w) for a, b, w in near_pairs)
        ]
    return sorted(((d, scores[d]) for d in docs), key=lambda r: (-r[1], r[0]))


def _gen_queries(oracle, pos_oracle, n=30, seed=7):
    rng = random.Random(seed)
    vocab = sorted(t for t in oracle.postings if t.isalpha() and len(t) >= 3)
    docs_with_text = [d for d, seq in pos_oracle.items() if len(seq) >= 10]

    def word():
        return rng.choice(vocab)

    def bigram():
        seq = pos_oracle[rng.choice(docs_with_text)]
        i = rng.randrange(len(seq) - 1)
        return seq[i], seq[i + 1]

    out = []
    for _ in range(n):
        clauses = []
        for _ in range(rng.randint(1, 4)):
            kind = rng.choice(
                ["bare", "bare", "must", "not", "phrase", "near",
                 "prefix", "suffix", "contains", "fuzzy"]
            )
            w = word()
            if kind == "bare":
                clauses.append(w)
            elif kind == "must":
                clauses.append("+" + w)
            elif kind == "not":
                clauses.append("-" + w)
            elif kind == "phrase":
                a, b = bigram()
                clauses.append(f'"{a} {b}"')
            elif kind == "near":
                a, b = bigram()
                if a != b:
                    clauses.append(f'"{a} {b}"~{rng.randint(2, 6)}')
            elif kind == "prefix":
                clauses.append(w[: rng.randint(2, min(4, len(w)))] + "*")
            elif kind == "suffix":
                clauses.append("*" + w[-rng.randint(2, min(4, len(w))):])
            elif kind == "contains":
                if len(w) >= 5:
                    clauses.append("*" + w[1:-1][:4] + "*")
            elif kind == "fuzzy":
                pos_i = rng.randrange(len(w))
                mutated = w[:pos_i] + rng.choice("abcdefgh") + w[pos_i + 1:]
                clauses.append(mutated + "~")
        if clauses:
            out.append(" ".join(clauses))
    return out


def test_qlang_fuzz_matches_reference(
    built_index, oracle_1k, pos_index, pos_oracle
):
    from vexor_ray.index.positions import PositionsIndex

    idx, _ = built_index
    s = Searcher(idx)
    pos = PositionsIndex(pos_index)
    queries = _gen_queries(oracle_1k, pos_oracle)
    assert len(queries) >= 25
    checked = nonempty = 0
    for q in queries:
        got = search_query(s, q, k=s.live_doc_count, positions=pos)
        want = _eval(q, oracle_1k, pos_oracle)
        assert got == want, q
        checked += 1
        nonempty += bool(got)
    assert checked == len(queries)
    assert nonempty >= 10  # the generator produces mostly non-trivial hits
