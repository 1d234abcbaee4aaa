"""From-scratch DOCX/PPTX extraction (stdlib zip+XML) + registry routing.

Semantics mirror the reference's python-docx / python-pptx extractors
(``vexor/services/content_extract_service.py:801-878``): paragraph /
shape-text collection with a running char-limit cutoff, then
``_cleanup_snippet`` (strip lines, join with spaces) and hard truncation.
"""

from __future__ import annotations

from vexor_ray.stages.officetext import (
    extract_docx_text,
    extract_pptx_text,
    make_simple_docx,
    make_simple_pptx,
)


def test_docx_roundtrip():
    docx = make_simple_docx(["Hello word", "second paragraph"])
    assert docx[:2] == b"PK"
    # paragraphs join with \n, then cleanup joins lines with a space
    assert extract_docx_text(docx) == "Hello word second paragraph"


def test_docx_empty_paragraphs_dropped_and_char_limit():
    docx = make_simple_docx(["  ", "alpha", "", "beta & <gamma>"])
    assert extract_docx_text(docx) == "alpha beta & <gamma>"
    # running total reaches the limit after "alpha" (5 chars >= 4) so later
    # paragraphs never load; then the hard [:4] truncation applies
    assert extract_docx_text(docx, char_limit=4) == "alph"


def test_docx_tabs_and_breaks():
    # hand-built document.xml with a tab and a break inside one paragraph
    import io
    import zipfile

    from vexor_ray.stages.officetext import _CONTENT_TYPES_DOCX, _W, _zip_bytes

    doc = (
        '<?xml version="1.0"?>'
        f'<w:document xmlns:w="{_W}"><w:body><w:p><w:r>'
        "<w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t>"
        "</w:r></w:p></w:body></w:document>"
    )
    payload = _zip_bytes(
        {"[Content_Types].xml": _CONTENT_TYPES_DOCX, "word/document.xml": doc}
    )
    # run text is "a\tb\nc"; cleanup splits lines and joins with a space
    assert extract_docx_text(payload) == "a\tb c"


def test_pptx_roundtrip_slide_order():
    pptx = make_simple_pptx([["slide one title", "bullet text"], ["slide two"]])
    assert extract_pptx_text(pptx) == "slide one title bullet text slide two"


def test_pptx_char_limit_stops_after_shape():
    pptx = make_simple_pptx([["abcdef", "never loaded"]])
    assert extract_pptx_text(pptx, char_limit=5) == "abcde"


def test_non_archive_returns_none():
    assert extract_docx_text(b"not a zip") is None
    assert extract_pptx_text(b"") is None
    assert extract_docx_text(make_simple_docx([])) is None
    assert extract_pptx_text(make_simple_pptx([[]])) is None


def test_registry_routes_office(ray_session):
    import pyarrow as pa

    from vexor_ray.stages.extract import (
        clear_extractors,
        make_extract_fn,
        register_extractor,
    )

    register_extractor((".docx",), extract_docx_text)
    register_extractor((".pptx",), extract_pptx_text)
    try:
        batch = pa.table(
            {
                "url": pa.array(["a.docx", "b.pptx", "c.txt"], type=pa.string()),
                "html": pa.array(
                    [
                        make_simple_docx(["word body"]),
                        make_simple_pptx([["slide body"]]),
                        b"plain text body",
                    ],
                    type=pa.binary(),
                ),
            }
        )
        out = make_extract_fn()(batch)
        texts = dict(zip(out["url"].to_pylist(), out["text"].to_pylist()))
        assert texts["a.docx"] == "word body"
        assert texts["b.pptx"] == "slide body"
        assert texts["c.txt"] == "plain text body"
    finally:
        clear_extractors()
