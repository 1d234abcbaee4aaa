"""From-scratch PDF text extraction + extractor-registry integration."""

from __future__ import annotations

import pytest

from vexor_ray.stages.pdftext import extract_pdf_text, make_simple_pdf


def test_flate_pdf_roundtrip():
    pdf = make_simple_pdf(["hello pdf world", "second line"], compress=True)
    assert pdf.startswith(b"%PDF-")
    assert extract_pdf_text(pdf) == "hello pdf world second line"


def test_uncompressed_and_escapes():
    pdf = make_simple_pdf(["parens (nested) \\ backslash"], compress=False)
    assert extract_pdf_text(pdf) == "parens (nested) \\ backslash"


def test_tj_array_and_char_limit():
    # hand-built single-stream PDF exercising the TJ array operator
    content = b"BT [(Hel) -20 (lo)] TJ (!) Tj ET"
    body = (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n"
        + content
        + b"\nendstream\nendobj\n%%EOF"
    )
    assert extract_pdf_text(body) == "Hello !"
    assert extract_pdf_text(body, char_limit=3) == "Hel"


def _raw_stream_pdf(content: bytes) -> bytes:
    return (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n"
        + content
        + b"\nendstream\nendobj\n%%EOF"
    )


def test_hex_strings():
    # <...> Tj and hex inside TJ arrays (PDF 32000-1 §7.3.4.3), including
    # the odd-digit-count rule (trailing 0 appended: <412> == "A " )
    pdf = _raw_stream_pdf(b"BT <48656C6C6F> Tj [<20776F72> (ld)] TJ <412> Tj ET")
    assert extract_pdf_text(pdf) == "Hello world A"


def test_objstm_packed_dicts_still_extracts():
    """Page/catalog dicts packed in a /ObjStm (xref-stream era): the content
    stream is still a regular stream (§7.5.7) and must still be found; the
    ObjStm container itself is decompressed and scanned, not mis-read as a
    content stream."""
    import zlib

    content = zlib.compress(b"BT (packed objects text) Tj ET")
    dicts = (
        b"<< /Type /Catalog /Pages 2 0 R >>"
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    )
    pairs = b"1 0 2 38 3 82"
    objstm_payload = pairs + b" " + dicts
    objstm = zlib.compress(objstm_payload)
    pdf = (
        b"%PDF-1.5\n"
        b"5 0 obj\n<< /Type /ObjStm /N 3 /First "
        + str(len(pairs) + 1).encode()
        + b" /Filter /FlateDecode /Length "
        + str(len(objstm)).encode()
        + b" >>\nstream\n"
        + objstm
        + b"\nendstream\nendobj\n"
        b"4 0 obj\n<< /Filter /FlateDecode /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n"
        + content
        + b"\nendstream\nendobj\n%%EOF"
    )
    assert extract_pdf_text(pdf) == "packed objects text"


def test_encrypted_pdf_refused():
    pdf = make_simple_pdf(["secret text"], compress=True)
    # splice an /Encrypt reference into the trailer dict
    encrypted = pdf.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    assert extract_pdf_text(encrypted) is None
    # ...but the literal word "/Encrypt" inside CONTENT text is not a trailer
    benign = make_simple_pdf(["the /Encrypt key controls security"])
    assert extract_pdf_text(benign) == "the /Encrypt key controls security"


def test_non_pdf_and_textless():
    assert extract_pdf_text(b"plain bytes") is None
    assert extract_pdf_text(b"") is None
    textless = make_simple_pdf([""], compress=True)
    assert extract_pdf_text(textless) in (None, "")


def test_registry_routes_pdf(ray_session):
    import pyarrow as pa

    from vexor_ray.stages.extract import (
        clear_extractors,
        make_extract_fn,
        register_extractor,
    )

    register_extractor((".pdf",), extract_pdf_text)
    try:
        batch = pa.table(
            {
                "url": pa.array(["a.pdf", "b.txt"], type=pa.string()),
                "html": pa.array(
                    [make_simple_pdf(["pdf text body"]), b"plain text body"],
                    type=pa.binary(),
                ),
            }
        )
        out = make_extract_fn()(batch)
        texts = dict(zip(out["url"].to_pylist(), out["text"].to_pylist()))
        assert texts["a.pdf"] == "pdf text body"
        assert texts["b.txt"] == "plain text body"
    finally:
        clear_extractors()


def test_cid_tounicode_extraction():
    """Type0/Identity-H text decodes through the ToUnicode CMap: the
    2-byte CIDs are offset from ASCII, so a latin-1 decode of the raw
    string bytes could never produce the expected text."""
    from vexor_ray.stages.pdftext import extract_pdf_text, make_cid_pdf

    pdf = make_cid_pdf(["Hello CID world", "second line 123"])
    assert extract_pdf_text(pdf) == "Hello CID world second line 123"
    # uncompressed variant exercises the same path without Flate
    pdf2 = make_cid_pdf(["plain zlib off"], compress=False)
    assert extract_pdf_text(pdf2) == "plain zlib off"


def test_cid_without_tounicode_skipped():
    """A Type0 font with no usable ToUnicode map must yield NO text from
    its strings (documented refusal — never garbled 2-byte soup)."""
    from vexor_ray.stages.pdftext import extract_pdf_text, make_cid_pdf

    assert extract_pdf_text(make_cid_pdf(["junk"], with_tounicode=False)) is None


def test_cid_and_simple_fonts_mix():
    """Font switches inside one content stream: simple-font text keeps the
    latin-1 path while the CID font's strings go through its CMap."""
    import zlib as _z

    from vexor_ray.stages.pdftext import extract_pdf_text, make_cid_pdf

    pdf = bytearray(make_cid_pdf(["cid part"]))
    # append a second content-bearing object using a simple font name that
    # has no Type0 binding (F1): latin-1 path
    extra = b"BT /F1 10 Tf (simple part) Tj ET"
    comp = _z.compress(extra)
    obj = (
        b"9 0 obj\n<< /Filter /FlateDecode /Length "
        + str(len(comp)).encode()
        + b" >>\nstream\n"
        + comp
        + b"\nendstream\nendobj\n"
    )
    at = bytes(pdf).find(b"xref")
    pdf[at:at] = obj
    text = extract_pdf_text(bytes(pdf))
    assert "cid part" in text and "simple part" in text


def test_cid_bfchar_and_array_bfrange():
    """bfchar pairs and the explicit-array bfrange form both parse."""
    from vexor_ray.stages.pdftext import _parse_tounicode

    cmap = (
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"2 beginbfchar <0041> <0061> <0042> <00660066> endbfchar\n"
        b"1 beginbfrange <0100> <0102> [<0058> <0059> <005A>] endbfrange\n"
    )
    width, m = _parse_tounicode(cmap)
    assert width == 2
    assert m[0x41] == "a" and m[0x42] == "ff"
    assert (m[0x100], m[0x101], m[0x102]) == ("X", "Y", "Z")


def test_ambiguous_font_name_keeps_simple_font_text():
    """A resource name bound to a Type0 font on one page and a simple font
    on another is ambiguous document-wide: the simple page's latin-1 text
    must survive (the CID page falls back to pre-CID behavior)."""
    import zlib as _z

    from vexor_ray.stages.pdftext import extract_pdf_text, make_cid_pdf

    pdf = bytearray(make_cid_pdf(["cid stuff"]))
    # a second page-ish object binding the SAME name /F9 to a simple font
    # (ref 8), plus a content stream using /F9 with latin-1 text
    extra = (
        b"7 0 obj\n<< /Type /Page /Resources << /Font << /F9 8 0 R >> >> >>\nendobj\n"
        b"8 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"
    )
    content = b"BT /F9 10 Tf (simple latin text) Tj ET"
    comp = _z.compress(content)
    extra += (
        b"9 0 obj\n<< /Filter /FlateDecode /Length "
        + str(len(comp)).encode()
        + b" >>\nstream\n"
        + comp
        + b"\nendstream\nendobj\n"
    )
    at = bytes(pdf).find(b"xref")
    pdf[at:at] = extra
    text = extract_pdf_text(bytes(pdf)) or ""
    assert "simple latin text" in text  # never decoded through the CMap


def test_tounicode_property_random_cmaps():
    """Property: rendering a random set of bfchar pairs + incrementing
    bfranges into CMap syntax and parsing it back recovers exactly the
    mapping we rendered (independent reference dict)."""
    import random

    from vexor_ray.stages.pdftext import _parse_tounicode

    rng = random.Random(99)
    for _ in range(25):
        want = {}
        parts = [b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"]
        # bfchar section
        chars = []
        for _ in range(rng.randint(0, 8)):
            code = rng.randrange(0x20, 0xFFF0)
            dst = rng.randrange(0x20, 0xD7FF)
            chars.append((code, dst))
            want[code] = chr(dst)
        if chars:
            body = "\n".join(f"<{c:04X}> <{d:04X}>" for c, d in chars)
            parts.append(
                f"{len(chars)} beginbfchar\n{body}\nendbfchar\n".encode()
            )
        # incrementing bfrange section
        ranges = []
        for _ in range(rng.randint(0, 4)):
            lo = rng.randrange(0x20, 0xF000)
            n = rng.randint(1, 40)
            base = rng.randrange(0x20, 0xD700)
            ranges.append((lo, lo + n - 1, base))
            for k in range(n):
                want[lo + k] = chr(base + k)
        if ranges:
            body = "\n".join(
                f"<{lo:04X}> <{hi:04X}> <{b:04X}>" for lo, hi, b in ranges
            )
            parts.append(
                f"{len(ranges)} beginbfrange\n{body}\nendbfrange\n".encode()
            )
        if not want:
            assert _parse_tounicode(b"".join(parts)) is None
            continue
        width, got = _parse_tounicode(b"".join(parts))
        assert width == 2
        assert got == want
