"""Bert-union tokenizer path: pre-tokenizer algorithm, union semantics
(reference ``vexor/bm25.py:24-51``), HF parity when ``tokenizers`` exists,
and end-to-end engine-vs-oracle rank identity with ``tokenizer="bert_union"``.
"""

from __future__ import annotations

import pytest

from vexor_ray.stages.berttok import (
    bert_pre_tokenize,
    make_tokenizer,
    tokenize_bert_union,
)


def test_pre_tokenize_splits_whitespace_and_punct():
    assert bert_pre_tokenize("Hello, world!") == ["Hello", ",", "world", "!"]
    assert bert_pre_tokenize("a.b.c") == ["a", ".", "b", ".", "c"]
    assert bert_pre_tokenize("  spaced\tout\n") == ["spaced", "out"]
    # underscore is ASCII punctuation for the Bert pre-tokenizer
    assert bert_pre_tokenize("snake_case") == ["snake", "_", "case"]
    assert bert_pre_tokenize("") == []


def test_union_semantics():
    # sub-tokens first (lowercased, alnum-bearing only), then regex whole
    # tokens not already present as sub-tokens
    toks = tokenize_bert_union("Snake_Case apply")
    assert toks == ["snake", "case", "apply", "snake_case"]
    # pure punctuation tokens are dropped
    assert tokenize_bert_union("!!! ...") == []
    # identical sub/whole tokens are not duplicated
    assert tokenize_bert_union("plain words") == ["plain", "words"]


def test_make_tokenizer_routing():
    assert make_tokenizer("regex")("A_b c") == ["a_b", "c"]
    assert make_tokenizer("bert_union")("A_b c") == ["a", "b", "c", "a_b"]
    with pytest.raises(ValueError):
        make_tokenizer("nope")


def test_hf_parity_when_available():
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers.pre_tokenizers import BertPreTokenizer

    hf = BertPreTokenizer()
    for text in [
        "Hello, world! snake_case a.b.c 3.14 () [x]",
        "tabs\tand\nnewlines",
        "中文测试, mixed ascii",
    ]:
        ours = bert_pre_tokenize(text)
        theirs = [t for t, _ in hf.pre_tokenize_str(text)]
        assert ours == theirs, text


def test_bert_union_rank_identity(ray_session, tmp_path):
    from vexor_ray.fixtures.pages import generate_queries, write_pages
    from vexor_ray.index.build import BuildConfig, build_index
    from vexor_ray.query.searcher import Searcher
    from vexor_ray.refimpl.oracle import build_oracle_index
    from vexor_ray.refimpl.oracle import search as oracle_search

    pages = write_pages(tmp_path / "pages", 300, seed=42, rows_per_file=100)
    idx = tmp_path / "idx"
    build_index(
        pages,
        idx,
        BuildConfig(
            tokenizer="bert_union",
            num_waves=2,
            partitions_per_wave=2,
            shard_group_size=2,
            tokenize_concurrency=2,
            salt_shift=8,
        ),
    )
    s = Searcher(idx)

    import pyarrow.parquet as pq

    rows = []
    ids = []
    for fi, f in enumerate(sorted(pages.glob("part-*.parquet"))):
        t = pq.read_table(f, columns=["url", "html"])
        for ri, (u, h) in enumerate(
            zip(t["url"].to_pylist(), t["html"].to_pylist())
        ):
            rows.append((u, h))
            ids.append((fi << 32) | ri)
    oracle = build_oracle_index(rows, ids=ids, tokenizer="bert_union")
    assert s.doc_count == oracle.doc_count
    assert abs(s.avg_doc_len - oracle.avg_doc_len) < 1e-9

    for q in generate_queries(30, seed=3):
        want = oracle_search(oracle, q["query"], k=10, tokenizer="bert_union")
        got_exact = s.search(q["query"], k=10, method="exact")
        got_wand = s.search(q["query"], k=10, method="wand")
        assert got_exact == want, q["query"]
        assert got_wand == want, q["query"]
    # the union path actually differs from regex: snake_case splits exist
    assert s.df("_zz_apply_rerank".strip("_").split("_")[0]) >= 0  # smoke
    assert s.preprocess_query("snake_case") == ["snake", "case", "snake_case"]
