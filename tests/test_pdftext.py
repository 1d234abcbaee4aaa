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
