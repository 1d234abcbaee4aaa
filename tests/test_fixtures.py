"""Fixture generator determinism + shape checks."""

from __future__ import annotations

import pyarrow as pa

from vexor_ray.fixtures import pages as fx
from vexor_ray.refimpl import bm25, build_oracle_index, textnorm


def test_schema_and_determinism():
    t1 = fx.generate_pages(300, seed=42)
    t2 = fx.generate_pages(300, seed=42)
    assert t1.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    assert t1.schema.field("html").type == pa.binary()
    assert t1.schema.field("warc_ts").type == pa.timestamp("us")
    assert t1.equals(t2)
    assert t1.num_rows == 300
    # unique urls
    assert len(set(t1.column("url").to_pylist())) == 300


def test_needle_dfs():
    t = fx.generate_pages(1000, seed=42)
    index = build_oracle_index(
        list(zip(t.column("url").to_pylist(), t.column("html").to_pylist()))
    )
    for term, want_df in fx.NEEDLES.items():
        assert index.df(term) == want_df, term
    assert index.df(fx.ABSENT_TERM) == 0
    assert index.df(fx.UNDERSCORE_IDENT.lower()) > 0


def test_edge_rows_present():
    t = fx.generate_pages(1000, seed=42)
    htmls = t.column("html").to_pylist()
    # some pages must fail the STRICT UTF-8 arm (invalid byte mid-stream)...
    n_strict_fail = sum(1 for h in htmls if textnorm.decode_utf8(h) is None)
    assert n_strict_fail > 0
    # ...and the charset-fallback arm rescues every one of them (reference
    # content_extract_service.py:726-749 behavior — legacy pages survive)
    extracted = [textnorm.extract_text(h) for h in htmls]
    assert all(e is not None for e in extracted)
    # and some have \r\n normalized away
    assert any(b"\r\n" in h for h in htmls)
    assert not any("\r\n" in e for e in extracted if e is not None)


def test_duplicate_text_pages_tie():
    t = fx.generate_pages(1000, seed=42)
    index = build_oracle_index(
        list(zip(t.column("url").to_pylist(), t.column("html").to_pylist()))
    )
    # find the injected duplicate-body pair: two docs, same doc_len, same tf
    # for a body term → exact score tie broken by docID
    # (construction: rows 13/14 share body and url token shape)
    texts = t.column("text").to_pylist()
    assert texts[13] == texts[14]


def test_query_set():
    qs = fx.generate_queries(120, seed=42)
    assert len(qs) == 120
    assert qs == fx.generate_queries(120, seed=42)
    assert any(len(bm25.tokenize(q["query"])) > 32 for q in qs)
    assert any(bm25.tokenize(q["query"]) == [] for q in qs)


def test_write_pages_cached(tmp_path):
    out = fx.write_pages(tmp_path / "pages", 200, seed=42, rows_per_file=64)
    files = sorted(out.glob("part-*.parquet"))
    assert len(files) == 4
    mtimes = [f.stat().st_mtime_ns for f in files]
    out2 = fx.write_pages(tmp_path / "pages", 200, seed=42, rows_per_file=64)
    assert out2 == out
    assert [f.stat().st_mtime_ns for f in files] == mtimes  # cache hit, no rewrite
