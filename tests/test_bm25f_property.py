"""Property tests: bm25f_topk and percolate vs independent pure-Python
references (a third implementation besides the Ray path and the SQL twin).

Few examples (Ray round-trip per example), no deadline; corpora are small
random token soups over a tiny alphabet so ties and empty fields occur.
"""

from __future__ import annotations

import math
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from vexor_ray.functions.bm25f import HEAD_LEN, W_BODY, W_TITLE, bm25f_topk
from vexor_ray.functions.percolate import percolate_table
from vexor_ray.spec import BM25_B, BM25_K1

VOCAB = ["alpha", "beta", "gamma", "delta", "eps"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=14),
    min_size=1,
    max_size=8,
)


def _write(tmpdir, docs):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(docs))), type=pa.int64()),
                "text": pa.array([" ".join(d) for d in docs]),
            }
        ),
        tmpdir / "documents.parquet",
    )
    return str(tmpdir)


def _ref_bm25f(docs, terms, k):
    n = len(docs)
    toks = [d for d in docs]
    with_tok = [d for d in toks if d]
    if not with_tok:
        return []
    lt = {i: min(len(d), HEAD_LEN) for i, d in enumerate(toks)}
    lb = {i: len(d) - lt[i] for i, d in enumerate(toks)}
    tok_docs = [i for i, d in enumerate(toks) if d]
    avgt = sum(lt[i] for i in tok_docs) / len(tok_docs)
    avgb = sum(lb[i] for i in tok_docs) / len(tok_docs)
    df = {
        t: sum(1 for d in toks if t in d)
        for t in terms
    }
    rows = []
    for i, d in enumerate(toks):
        tft = Counter(d[: lt[i]])
        tfb = Counter(d[lt[i]:])
        s = 0.0
        hit = False
        for t in terms:
            if df[t] == 0 or (tft[t] == 0 and tfb[t] == 0):
                continue
            hit = True
            bt = 1.0 - BM25_B + BM25_B * lt[i] / avgt if avgt else 1.0
            bb = 1.0 - BM25_B + BM25_B * lb[i] / avgb if avgb else 1.0
            tfw = W_TITLE * tft[t] / bt + W_BODY * tfb[t] / bb
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tfw / (BM25_K1 + tfw)
        if hit:
            rows.append((i, round(s, 6)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


@settings(max_examples=12, deadline=None)
@given(docs=docs_strategy, q=st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3, unique=True))
def test_bm25f_matches_python_reference(ray_session, tmp_path_factory, docs, q):
    sf = _write(tmp_path_factory.mktemp("prop"), docs)
    got = bm25f_topk(sf, " ".join(q), k=5)
    want = _ref_bm25f(docs, q, 5)
    assert list(
        zip(got.column("doc_id").to_pylist(), got.column("score").to_pylist())
    ) == [(d, s) for d, s in want]


@settings(max_examples=12, deadline=None)
@given(
    docs=docs_strategy,
    queries=st.lists(
        st.lists(st.sampled_from(VOCAB + ["zzz"]), min_size=1, max_size=3),
        min_size=1,
        max_size=4,
    ),
)
def test_percolate_matches_set_logic(ray_session, tmp_path_factory, docs, queries):
    sf = _write(tmp_path_factory.mktemp("perc"), docs)
    stored = [(i, " ".join(q)) for i, q in enumerate(queries)]
    got = percolate_table(sf, stored)
    pairs = list(
        zip(got.column("doc_id").to_pylist(), got.column("query_id").to_pylist())
    )
    want = sorted(
        (i, qid)
        for i, d in enumerate(docs)
        for qid, q in enumerate(queries)
        if set(q) <= set(d)
    )
    assert pairs == want
