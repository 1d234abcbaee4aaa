"""From-scratch DOCX / PPTX text extraction (stdlib zipfile + ElementTree).

OOXML documents are zip archives of XML parts; the text lives in
``word/document.xml`` (DOCX) and ``ppt/slides/slideN.xml`` (PPTX).  This
module re-implements the reference's extractor semantics
(``vexor/services/content_extract_service.py:801-858``) without python-docx
/ python-pptx:

* DOCX — every ``<w:p>`` paragraph's text is the document-order
  concatenation of its ``<w:t>`` runs with ``<w:tab/>`` → ``\\t`` and
  ``<w:br/>`` / ``<w:cr/>`` → ``\\n`` (python-docx ``Run.text`` semantics);
  stripped, empty paragraphs dropped, joined with ``\\n`` until the running
  character total reaches ``char_limit``.
* PPTX — slides in ``slideN.xml`` numeric order; per shape
  (``<p:sp>``/``<p:txBody>``) the ``<a:p>`` paragraph texts (concatenated
  ``<a:t>`` runs) are stripped and joined with a space
  (``_extract_shape_text``, reference line 855-872); non-empty shape texts
  joined with ``\\n`` with the same running char-limit cutoff.
* Both paths finish with the reference's ``_cleanup_snippet`` (strip lines,
  join with a single space) and a hard ``[:char_limit]`` truncation
  (reference line 874-878).

Returns ``None`` for undecodable archives or empty text — the
extractor-registry contract (``stages/extract.py``).  Register with::

    from vexor_ray.stages.extract import register_extractor
    from vexor_ray.stages.officetext import extract_docx_text, extract_pptx_text
    register_extractor((".docx",), extract_docx_text)
    register_extractor((".pptx",), extract_pptx_text)

``make_simple_docx`` / ``make_simple_pptx`` assemble minimal valid OOXML
archives for tests and fixtures (no external files needed).
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET


def _local(tag: str) -> str:
    """Namespace-agnostic local element name ('{ns}t' -> 't')."""
    return tag.rsplit("}", 1)[-1]


def _cleanup_snippet(snippet: str) -> str | None:
    # reference content_extract_service.py:874-878
    lines = [line.strip() for line in snippet.splitlines() if line.strip()]
    joined = " ".join(lines)
    return joined or None


def _finish(parts: list[str], char_limit: int) -> str | None:
    combined = "\n".join(parts)
    if not combined:
        return None
    cleaned = _cleanup_snippet(combined)
    if not cleaned:
        return None
    return cleaned[:char_limit] if char_limit else cleaned


def _docx_paragraph_text(p: ET.Element) -> str:
    # python-docx Run.text semantics: w:t text, w:tab -> \t, w:br/w:cr -> \n
    out: list[str] = []
    for el in p.iter():
        name = _local(el.tag)
        if name == "t":
            out.append(el.text or "")
        elif name == "tab":
            out.append("\t")
        elif name in ("br", "cr"):
            out.append("\n")
    return "".join(out)


def extract_docx_text(payload: bytes, char_limit: int = 0) -> str | None:
    """DOCX bytes -> text per reference ``_docx_extractor`` semantics."""
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            data = zf.read("word/document.xml")
        root = ET.fromstring(data)
    except Exception:
        return None
    buffer: list[str] = []
    total = 0
    for el in root.iter():
        if _local(el.tag) != "p":
            continue
        text = _docx_paragraph_text(el).strip()
        if not text:
            continue
        buffer.append(text)
        total += len(text)
        if char_limit and total >= char_limit:
            break
    return _finish(buffer, char_limit)


def _shape_text(txbody: ET.Element) -> str | None:
    # reference _extract_shape_text (content_extract_service.py:855-872):
    # paragraph texts stripped, empties dropped, joined with " ".
    paragraphs: list[str] = []
    for el in txbody.iter():
        if _local(el.tag) != "p":
            continue
        runs = [t.text or "" for t in el.iter() if _local(t.tag) == "t"]
        text = "".join(runs).strip()
        if text:
            paragraphs.append(text)
    return " ".join(paragraphs) or None


_SLIDE_RE = re.compile(r"^ppt/slides/slide(\d+)\.xml$")


def extract_pptx_text(payload: bytes, char_limit: int = 0) -> str | None:
    """PPTX bytes -> text per reference ``_pptx_extractor`` semantics."""
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            slides = sorted(
                (int(m.group(1)), name)
                for name in zf.namelist()
                if (m := _SLIDE_RE.match(name))
            )
            datas = [zf.read(name) for _, name in slides]
    except Exception:
        return None
    buffer: list[str] = []
    total = 0
    for data in datas:
        try:
            root = ET.fromstring(data)
        except Exception:
            continue
        for el in root.iter():
            if _local(el.tag) != "txBody":
                continue
            text = _shape_text(el)
            if not text:
                continue
            buffer.append(text)
            total += len(text)
            if char_limit and total >= char_limit:
                break
        if char_limit and total >= char_limit:
            break
    return _finish(buffer, char_limit)


# ---------------------------------------------------------------------------
# Fixture builders (minimal valid OOXML archives, deterministic bytes)

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_P = "http://schemas.openxmlformats.org/presentationml/2006/main"

_CONTENT_TYPES_DOCX = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.wordprocessingml.document.main+xml"/></Types>'
)

_CONTENT_TYPES_PPTX = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="xml" ContentType="application/xml"/></Types>'
)


def _zip_bytes(parts: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in parts.items():
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(info, data)
    return buf.getvalue()


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def make_simple_docx(paragraphs: list[str]) -> bytes:
    """Minimal DOCX whose document.xml holds one ``<w:p>`` per string."""
    body = "".join(
        f'<w:p><w:r><w:t xml:space="preserve">{_xml_escape(p)}</w:t></w:r></w:p>'
        for p in paragraphs
    )
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W}"><w:body>{body}</w:body></w:document>'
    )
    return _zip_bytes(
        {"[Content_Types].xml": _CONTENT_TYPES_DOCX, "word/document.xml": doc}
    )


def make_simple_pptx(slides: list[list[str]]) -> bytes:
    """Minimal PPTX: ``slides[i]`` is the list of shape texts on slide i+1."""
    parts: dict[str, str] = {"[Content_Types].xml": _CONTENT_TYPES_PPTX}
    for i, shape_texts in enumerate(slides, start=1):
        shapes = "".join(
            f'<p:sp><p:txBody><a:p><a:r><a:t>{_xml_escape(t)}</a:t></a:r></a:p>'
            "</p:txBody></p:sp>"
            for t in shape_texts
        )
        parts[f"ppt/slides/slide{i}.xml"] = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<p:sld xmlns:p="{_P}" xmlns:a="{_A}"><p:cSld><p:spTree>{shapes}'
            "</p:spTree></p:cSld></p:sld>"
        )
    return _zip_bytes(parts)
