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


def test_invalid_utf8_mid_stream_falls_back_to_charset():
    # Pre-fallback this page was dropped; now the legacy-encoding arm decodes
    # it (reference content_extract_service.py:726-749).  The exact chars
    # depend on the detector, but the ASCII run must survive.
    out = textnorm.extract_text(b"hel\xff\xfelo")
    assert out is None or "hel" in out  # detector may refuse pure garbage
    assert textnorm.decode_utf8(b"hel\xff\xfelo") is None  # strict arm unchanged


def test_charset_fallback_utf16_boms():
    import codecs

    for bom, name in (
        (codecs.BOM_UTF16_LE, "utf-16-le"),
        (codecs.BOM_UTF16_BE, "utf-16-be"),
    ):
        body = "Hello multilingual page with plenty of body text to detect"
        data = bom + body.encode(name)
        assert textnorm.decode_text(data) == body
        assert textnorm._decode_builtin_fallback(data) == body


def test_charset_fallback_legacy_singlebyte():
    # cp1252 page: invalid as UTF-8 (\xe9 etc).  Detection is heuristic, so
    # pin only that the page SURVIVES and keeps its ASCII words.
    body = "Le café naïve coûte 3€ — déjà vu, said the résumé of the señor."
    data = body.encode("cp1252")
    out = textnorm.decode_text(data)
    assert out is not None and "vu, said the" in out
    # the builtin arm is exact for cp1252
    assert textnorm._decode_builtin_fallback(data) == body


def test_charset_fallback_shiftjis():
    body = "これは日本語のテキストです。文字コードの判定テストに使います。"
    out = textnorm.decode_text(body.encode("shift-jis"))
    assert out == body  # charset_normalizer nails shift-jis


def test_charset_fallback_char_limit_applies():
    body = "é" * 500
    out = textnorm.decode_charset_fallback(body.encode("cp1252"), char_limit=10)
    assert out is not None and len(out) == 10


def test_decode_text_prefers_strict_utf8():
    # valid UTF-8 must NEVER reach the detector (byte cap + incremental tail
    # semantics of the strict arm are part of the oracle contract)
    data = "hello ".encode() + "中".encode("utf-8")[:2]
    assert textnorm.decode_text(data) == "hello "


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
