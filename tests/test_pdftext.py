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
