"""Extraction / normalization micro-cases (FIXTURES.md §3)."""

from __future__ import annotations

from vexor_ray.refimpl import textnorm


def test_crlf_and_strip():
    assert textnorm.extract_text(b"  hello\r\nworld \n") == "hello\nworld"


def test_empty_and_whitespace_only():
    assert textnorm.extract_text(b"") is None
    assert textnorm.extract_text(b"   \r\n  ") is None
    assert textnorm.extract_text(None) is None


def test_truncated_multibyte_tail_tolerated():
    # a valid prefix of a multi-byte char at the very end decodes to the prefix
    data = "hello ".encode() + "中".encode("utf-8")[:2]
    assert textnorm.extract_text(data) == "hello"


def test_invalid_utf8_mid_stream_returns_none():
    assert textnorm.extract_text(b"hel\xff\xfelo") is None


def test_char_limit_and_byte_cap():
    # byte cap = 4 x char_limit, then char cap
    text = "a" * 100
    assert textnorm.extract_text(text.encode(), char_limit=10) == "a" * 10
    # multi-byte: 3 bytes per char; byte cap 40 -> 13 full chars + truncated tail
    cjk = "中" * 100
    out = textnorm.extract_text(cjk.encode("utf-8"), char_limit=10)
    assert out == "中" * 10


def test_char_limit_zero_means_unbounded():
    text = "b" * 5000
    assert textnorm.extract_text(text.encode(), char_limit=0) == text


def test_cleanup_snippet():
    assert textnorm.cleanup_snippet("  a \n\n  b  \n c ") == "a b c"
    assert textnorm.cleanup_snippet("  \n  ") is None


def test_chunk_text_sliding_window():
    text = "x" * 2500
    chunks = textnorm.chunk_text(text, chunk_size=1000, overlap=100)
    assert [len(c) for c in chunks] == [1000, 1000, 700]
    assert textnorm.chunk_text("", 1000, 100) == []
    # stride = max(size - overlap, 1)
    chunks = textnorm.chunk_text("abcdef", chunk_size=2, overlap=5)
    assert chunks == ["ab", "bc", "cd", "de", "ef"]
