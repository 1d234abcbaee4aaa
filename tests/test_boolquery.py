"""Boolean-filtered BM25 and proximity (NEAR) queries vs pure oracles."""

from __future__ import annotations

import math

import pytest

from vexor_ray.query.searcher import Searcher
from vexor_ray.refimpl import search as oracle_search


def _bool_oracle(oracle, must, should, must_not, k):
    docs_of = lambda t: {p[0] for p in oracle.postings.get(t, [])}
    scoring = " ".join(list(dict.fromkeys(must + should)))
    full = oracle_search(oracle, scoring, k=oracle.doc_count)
    out = []
    for d, s in full:
        if all(d in docs_of(t) for t in must) and not any(
            d in docs_of(t) for t in must_not
        ):
            out.append((d, s))
    return out[:k]


@pytest.mark.parametrize(
    "must,should,must_not",
    [
        (["needledften"], [], []),
        (["needledfhundred"], ["needledften"], []),
        (["needledfhundred"], [], ["needledften"]),
        ([], ["needledften", "needledfhundred"], []),
        (["needledften", "needledfhundred"], [], []),  # likely empty ∩
        (["qqqzzzabsentterm"], ["needledften"], []),  # absent must → empty
        ([], ["needledfhundred"], ["qqqzzzabsentterm"]),  # absent not → no-op
    ],
)
def test_boolean_matches_oracle(built_index, oracle_1k, must, should, must_not):
    out, _ = built_index
    s = Searcher(out)
    got = s.search_boolean(must, should, must_not, k=20)
    exp = _bool_oracle(oracle_1k, must, should, must_not, 20)
    assert [d for d, _ in got] == [d for d, _ in exp], (must, should, must_not)
    for (_, gs), (_, es) in zip(got, exp):
        assert math.isclose(gs, es, rel_tol=1e-9)


def test_boolean_filters_hot_terms(built_index, oracle_1k):
    """must_not on a wrapper token that appears in EVERY page → empty."""
    out, _ = built_index
    s = Searcher(out)
    assert s.search_boolean(["needledften"], [], ["html"], k=5) == []
    # and must on it keeps everything the scoring term matches
    got = s.search_boolean(["html"], ["needledften"], [], k=5)
    exp = _bool_oracle(oracle_1k, ["html"], ["needledften"], [], 5)
    assert [d for d, _ in got] == [d for d, _ in exp]


def test_prefix_expansion_and_search(built_index, oracle_1k):
    import pytest as _pytest

    out, _ = built_index
    s = Searcher(out)
    # every generation of the shared index carries a term dictionary
    assert any(
        g.get("termdict") for gens in s._wave_gens.values() for g in gens
    )
    exp_vocab = sorted(
        t for t in oracle_1k.postings if t.startswith("needledf")
    )
    assert s.expand_prefix("needledf") == exp_vocab
    assert s.expand_prefix("qqqzzzabsent") == []
    with _pytest.raises(ValueError):
        s.expand_prefix("")
    # deterministic lexicographic truncation
    assert s.expand_prefix("needledf", max_terms=2) == exp_vocab[:2]

    from vexor_ray.refimpl import bm25 as refbm25

    got = s.search_prefix("needledf", k=15, max_terms=None)
    scores = refbm25.score_postings(
        exp_vocab, oracle_1k.postings, oracle_1k.doc_count, oracle_1k.avg_doc_len
    )
    exp = refbm25.top_k(scores, 15)
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert math.isclose(gs, es, rel_tol=1e-9)


def test_prefix_legacy_fallback_scan(built_index):
    """Indexes without dictionaries scan segment term columns instead."""
    out, _ = built_index
    s = Searcher(out)
    want = s.expand_prefix("needledf")
    for gens in s._wave_gens.values():
        for g in gens:
            g["termdict"] = []
    assert s.expand_prefix("needledf") == want


def _lev(a: str, b: str) -> int:
    """Textbook Levenshtein (dynamic programming), the test's ground truth."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_expansion_and_search(built_index, oracle_1k):
    out, _ = built_index
    s = Searcher(out)
    vocab = list(oracle_1k.postings)
    # edit-distance-1 membership matches the DP ground truth over the vocab
    for probe in ["needledften", "htmk", "bodyy", "xyzzyqq", "a"]:
        exp = sorted(t for t in vocab if _lev(probe, t) <= 1)
        assert s.expand_fuzzy(probe) == exp, probe

    # the linear edit-1 check agrees with DP on adversarial pairs
    for a, b in [
        ("abc", "abc"), ("abc", "abd"), ("abc", "ab"), ("abc", "abcd"),
        ("abc", "bc"), ("abc", "acb"), ("ab", "ba"), ("aaa", "aba"),
        ("abcd", "abdc"), ("x", ""), ("", ""), ("abab", "bab"),
    ]:
        assert Searcher._within_edit1(a, b) == (_lev(a, b) <= 1), (a, b)

    # typo query scores the expanded union exactly like the oracle math
    from vexor_ray.refimpl import bm25 as refbm25

    probe = "needledftem"  # 1 edit from needledften
    exp_terms = sorted(t for t in vocab if _lev(probe, t) <= 1)
    assert exp_terms  # the corpus needle is reachable
    got = s.search_fuzzy(probe, k=15, max_terms_per_token=None)
    scores = refbm25.score_postings(
        exp_terms, oracle_1k.postings, oracle_1k.doc_count, oracle_1k.avg_doc_len
    )
    exp = refbm25.top_k(scores, 15)
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert math.isclose(gs, es, rel_tol=1e-9)


def test_suggest_prefers_common_terms(built_index, oracle_1k):
    out, _ = built_index
    s = Searcher(out)
    # "htmk" is 1 edit from "html" (every page) — the obvious correction
    assert s.suggest("htmk") == "html"
    # an exact vocabulary term suggests itself (df dominates its typos)
    assert s.suggest("html") == "html"
    assert s.suggest("qzqzqzqz") is None


def _near_oracle(pos_corpus, a, b, window):
    out = {}
    for did, toks in pos_corpus.items():
        pa_ = [i for i, t in enumerate(toks, start=1) if t == a]
        pb = [i for i, t in enumerate(toks, start=1) if t == b]
        dists = [abs(x - y) for x in pa_ for y in pb if not (a == b and x == y)]
        if dists and min(dists) <= window:
            out[did] = min(dists)
    return out


def test_near_matches_oracle(pos_index, pos_oracle):
    from vexor_ray.index.positions import PositionsIndex

    idx = PositionsIndex(pos_index)
    pairs = [
        ("body", "html", 2),
        ("head", "title", 4),
        ("needledften", "html", 1000),
        ("batch", "batch", 3),  # same-term proximity
        ("qqqzzzabsentterm", "html", 10),
    ]
    n_nonempty = 0
    for a, b, w in pairs:
        got = idx.near_occurrences(a, b, w)
        exp = _near_oracle(pos_oracle, a, b, w)
        got_d = dict(
            zip(got["doc_id"].to_pylist(), got["min_dist"].to_pylist())
        )
        assert got_d == exp, (a, b, w)
        n_nonempty += bool(exp)
    assert n_nonempty >= 3


def _prf_oracle(oracle, query, fb_docs, fb_terms, k):
    """Pure-python PRF twin: rounded-score feedback cut, integer
    rank-weighted tf expansion, plain re-score of the expanded set."""
    from vexor_ray.refimpl.bm25 import preprocess_query

    terms = preprocess_query(query)
    base = oracle_search(oracle, query, k=oracle.doc_count)
    fb = sorted(((round(s, 6), d) for d, s in base), key=lambda p: (-p[0], p[1]))
    fb_ids = [d for _, d in fb[:fb_docs]]
    rank_w = {d: fb_docs - r for r, d in enumerate(fb_ids)}
    weights: dict[str, int] = {}
    for t, plist in oracle.postings.items():
        if t in set(terms):
            continue
        for doc_id, tf, _dl in plist:
            if doc_id in rank_w:
                weights[t] = weights.get(t, 0) + tf * rank_w[doc_id]
    expansion = [
        t for t, _ in sorted(weights.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:fb_terms]
    expanded = list(dict.fromkeys(terms + expansion))[:32]
    full = oracle_search(oracle, " ".join(expanded), k=oracle.doc_count)
    ranked = sorted(((round(s, 6), d) for d, s in full), key=lambda p: (-p[0], p[1]))
    return [(d, s) for s, d in ranked[:k]], expansion


@pytest.mark.parametrize("query", ["needledfhundred retrieval", "engine index"])
def test_prf_expansion_matches_oracle(built_index, oracle_1k, query):
    out, _ = built_index
    s = Searcher(out)
    terms = s.preprocess_query(query)
    exp_engine = s.expansion_terms(terms, fb_docs=10, fb_terms=5)
    exp_want, exp_oracle = None, None
    want, exp_oracle = _prf_oracle(oracle_1k, query, 10, 5, 20)
    assert exp_engine == exp_oracle, query
    got = s.search_prf(query, k=20, fb_docs=10, fb_terms=5)
    # engine ranks by exact score; compare the rounded ranking like the twin
    got_rounded = sorted(
        ((round(sc, 6), d) for d, sc in s.search_prf(query, k=oracle_1k.doc_count, fb_docs=10, fb_terms=5)),
        key=lambda p: (-p[0], p[1]),
    )[:20]
    assert [d for _, d in got_rounded] == [d for d, _ in want], query
    for (gs, _), (_, es) in zip(got_rounded, want):
        assert math.isclose(gs, es, rel_tol=1e-9)


def test_prf_expansion_excludes_query_terms(built_index):
    out, _ = built_index
    s = Searcher(out)
    terms = s.preprocess_query("retrieval engine")
    exp = s.expansion_terms(terms, fb_docs=10, fb_terms=8)
    assert len(exp) <= 8
    assert not set(exp) & set(terms)


def test_autocomplete_ranked_by_df(built_index, oracle_1k):
    out, _ = built_index
    s = Searcher(out)
    got = s.autocomplete("needledf", k=10)
    want = sorted(
        (
            (t, len(pl))
            for t, pl in oracle_1k.postings.items()
            if t.startswith("needledf")
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    assert got == want
    with pytest.raises(ValueError):
        s.autocomplete("")


def test_parse_query_clauses():
    from vexor_ray.query.qlang import parse_query

    p = parse_query('+hash "hash join" sca* joi~ -slow  "  " bare')
    assert p.must == ["hash"] and p.must_not == ["slow"]
    assert p.phrases == ["hash join"] and p.should == ["bare"]
    assert p.prefixes == ["sca"] and p.fuzzies == ["joi"]


def test_query_language_composes_primitives(built_index, oracle_1k):
    """A must+prefix+fuzzy query (no phrase) must equal composing the
    primitives by hand: boolean filter over the union-expanded scoring set."""
    from vexor_ray.query.qlang import search_query

    out, _ = built_index
    s = Searcher(out)
    got = search_query(s, "+needledfhundred needledf* engine~", k=15)
    scoring = list(
        dict.fromkeys(
            ["needledfhundred"]
            + s.expand_prefix("needledf", 64)
            + s.expand_fuzzy("engine", 64)
        )
    )
    want = s.search_boolean(
        must=["needledfhundred"],
        should=[t for t in scoring if t != "needledfhundred"],
        k=15,
    )
    assert got == want


def test_query_language_phrase_requires_positions(built_index):
    from vexor_ray.query.qlang import search_query

    out, _ = built_index
    s = Searcher(out)
    with pytest.raises(ValueError, match="positions"):
        search_query(s, '"retrieval engine"', k=5)


def test_query_language_phrase_filter(built_index, pos_index, pos_oracle):
    """Phrase clause filters the boolean result to phrase-containing docs
    (built_index and pos_index share pages_1k, so lineage docIDs agree)."""
    from collections import Counter

    from vexor_ray.index.positions import PositionsIndex
    from vexor_ray.query.qlang import search_query

    # the corpus's most common bigram is guaranteed to occur somewhere
    bigrams = Counter(
        (a, b)
        for toks in pos_oracle.values()
        for a, b in zip(toks, toks[1:])
    )
    (w1, w2), _n = bigrams.most_common(1)[0]
    phrase = f"{w1} {w2}"
    idx, _ = built_index
    s = Searcher(idx)
    pos = PositionsIndex(pos_index)
    base = search_query(s, phrase, k=s.live_doc_count)
    got = search_query(s, f'{phrase} "{phrase}"', k=s.live_doc_count, positions=pos)
    phrase_docs = set(
        pos.phrase_occurrences(phrase).column("doc_id").to_pylist()
    )
    assert got == [r for r in base if r[0] in phrase_docs]
    assert len(got) >= 1


def test_search_dataset_matches_driver_searcher(built_index):
    """Bulk retrieval as a Dataset stage == per-query driver-side search."""
    import ray.data

    from vexor_ray.query.server import search_dataset

    out, _ = built_index
    s = Searcher(out)
    queries = ["needledften retrieval", "needledfhundred", "engine index"]
    qds = ray.data.from_items(
        [{"query_id": i + 1, "query": q} for i, q in enumerate(queries)]
    )
    hits = search_dataset(qds, str(out), k=7, concurrency=2).to_pandas()
    for i, q in enumerate(queries, start=1):
        got = [
            (int(d), float(sc))
            for d, sc in zip(
                hits[hits.query_id == i].sort_values("rank")["doc_id"],
                hits[hits.query_id == i].sort_values("rank")["score"],
            )
        ]
        assert got == [(int(d), float(x)) for d, x in s.search(q, k=7)], q


def test_parse_query_near_clause():
    from vexor_ray.query.qlang import parse_query

    p = parse_query('"alpha beta"~5 "exact phrase" +must')
    assert p.nears == [("alpha beta", 5)]
    assert p.phrases == ["exact phrase"] and p.must == ["must"]


def test_query_language_near_filter(built_index, pos_index, pos_oracle):
    """Proximity clause "a b"~w filters to docs where the pair occurs
    within w tokens (either order), matching a python oracle."""
    from collections import Counter

    from vexor_ray.index.positions import PositionsIndex
    from vexor_ray.query.qlang import search_query

    bigrams = Counter(
        (a, b)
        for toks in pos_oracle.values()
        for a, b in zip(toks, toks[1:])
        if a != b
    )
    (w1, w2), _n = bigrams.most_common(1)[0]
    idx, _ = built_index
    s = Searcher(idx)
    pos = PositionsIndex(pos_index)
    W = 4
    base = search_query(s, f"{w1} {w2}", k=s.live_doc_count)
    got = search_query(
        s, f'{w1} {w2} "{w1} {w2}"~{W}', k=s.live_doc_count, positions=pos
    )

    def within(toks):
        pa_ = [i for i, t in enumerate(toks) if t == w1]
        pb_ = [i for i, t in enumerate(toks) if t == w2]
        return any(abs(i - j) <= W for i in pa_ for j in pb_)

    want_docs = {d for d, toks in pos_oracle.items() if within(toks)}
    assert got == [r for r in base if r[0] in want_docs]
    assert len(got) >= 1


def test_near_clause_requires_two_words(built_index, pos_index):
    from vexor_ray.index.positions import PositionsIndex
    from vexor_ray.query.qlang import search_query

    idx, _ = built_index
    s = Searcher(idx)
    pos = PositionsIndex(pos_index)
    with pytest.raises(ValueError, match="exactly"):
        search_query(s, '"one two three"~3', k=5, positions=pos)


def test_suffix_and_contains_expansion(built_index, oracle_1k):
    """expand_suffix / expand_contains match a python scan of the corpus
    vocabulary, and the qlang *suf / *mid* forms compose onto scoring."""
    from vexor_ray.query.qlang import parse_query, search_query

    idx, _ = built_index
    s = Searcher(idx)
    vocab = set(oracle_1k.postings)

    got = s.expand_suffix("tion")
    want = sorted(t for t in vocab if t.endswith("tion"))
    assert got == want
    got_c = s.expand_contains("ngin")
    want_c = sorted(t for t in vocab if "ngin" in t)
    assert got_c == want_c

    p = parse_query("*tion *ngin* plain")
    assert p.suffixes == ["tion"] and p.contains == ["ngin"]
    assert p.should == ["plain"]

    if want:
        # the qlang query equals a hand-composed boolean over the expansion
        direct = search_query(s, "*tion", k=10)
        manual = s.search_boolean(must=[], should=want[:64], must_not=[], k=10)
        assert direct == manual


def test_suffix_empty_rejected(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    with pytest.raises(ValueError):
        s.expand_suffix("")
    with pytest.raises(ValueError):
        s.expand_contains("")


def test_min_should_match(built_index, oracle_1k):
    """min_should_match=m keeps only docs containing >= m distinct should
    terms, ranked identically to the unfiltered boolean query."""
    from vexor_ray.refimpl.bm25 import score_postings

    idx, _ = built_index
    s = Searcher(idx)
    should = ["needledften", "needledftwenty", "needledfthirty"]
    base = s.search_boolean(should=should, k=s.live_doc_count)
    for m in (1, 2, 3):
        got = s.search_boolean(
            should=should, k=s.live_doc_count, min_should_match=m
        )

        def n_terms(d):
            return sum(
                1
                for t in should
                if any(p[0] == d for p in oracle_1k.postings.get(t, ()))
            )

        want = [r for r in base if n_terms(r[0]) >= m]
        assert got == want, m
    assert s.search_boolean(should=should, k=10, min_should_match=4) == []


def test_min_should_match_beyond_scoring_cap(built_index):
    """Docs matching >= m should terms exclusively via terms capped out of
    the MAX_QUERY_TERMS scoring set must still be candidates (score 0.0 —
    the scoring terms don't occur in them)."""
    from vexor_ray.spec import MAX_QUERY_TERMS

    idx, _ = built_index
    s = Searcher(idx)
    # 32 corpus-absent fillers occupy the whole scoring cap; the df=1
    # needle term lands beyond it
    should = [f"zzqxabsent{i}" for i in range(MAX_QUERY_TERMS)] + [
        "needledfone"
    ]
    got = s.search_boolean(should=should, k=10, min_should_match=1)
    want_docs = [d for d, _ in s.search_boolean(should=["needledfone"], k=10)]
    assert [d for d, _ in got] == want_docs
    assert all(x == 0.0 for _, x in got)  # capped-out terms score zero
