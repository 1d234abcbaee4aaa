"""Extraction stage: ``pages(url, html, ...) → (url, text)``.

A stateless ``map_batches`` function over pyarrow batches.  The per-row
extraction is the SAME Python function the oracle uses
(``vexor_ray.refimpl.textnorm.extract_text``) — the byte-identical-per-url
invariant holds because there is one implementation, not two.  Pages whose
extraction yields ``None`` (undecodable, empty) are dropped here and never
receive a docID.

Scale notes: ``html`` is the wide column — keep ``batch_size`` small in this
stage and drop ``html`` immediately (the output batch carries only url+text)
so downstream blocks are narrow.
"""

from __future__ import annotations

import pyarrow as pa

from collections.abc import Callable

from ..refimpl.textnorm import extract_text
from ..spec import FULL_CHAR_LIMIT

# Extractor registry (the analogue of the reference's ExtractorEntry
# registry, ``content_extract_service.py:115-126``): url-suffix → extractor
# ``fn(payload: bytes, char_limit) -> str | None``.  The default pipeline is
# the byte-identical UTF-8 path for EVERY suffix; registering a suffix (e.g.
# ".pdf" once a pdf library exists) overrides only that suffix.
_EXTRACTORS: dict[str, Callable[[bytes, int], str | None]] = {}


def register_extractor(
    suffixes: tuple[str, ...], fn: Callable[[bytes, int], str | None]
) -> None:
    for s in suffixes:
        _EXTRACTORS[s.lower()] = fn


def clear_extractors() -> None:
    _EXTRACTORS.clear()


def register_default_extractors() -> None:
    """Register the built-in non-text extractors (pdf/docx/pptx).

    Mirrors the reference's default registry
    (``content_extract_service.py:884-904``); opt-in here because the default
    web-pages path treats every payload as UTF-8 text.
    """
    from .officetext import extract_docx_text, extract_pptx_text
    from .pdftext import extract_pdf_text

    register_extractor((".pdf",), extract_pdf_text)
    register_extractor((".docx",), extract_docx_text)
    register_extractor((".pptx",), extract_pptx_text)


def _dispatch(
    url: str,
    payload: bytes,
    char_limit: int,
    extractors: dict[str, Callable[[bytes, int], str | None]],
) -> str | None:
    if extractors:
        dot = url.rfind(".")
        if dot >= 0:
            fn = extractors.get(url[dot:].lower())
            if fn is not None:
                return fn(payload, char_limit)
    return extract_text(payload, char_limit)


def make_extract_fn(char_limit: int = FULL_CHAR_LIMIT):
    """Returns a map_batches fn: pa.Table(url, html, ...) → pa.Table(url, text).

    The extractor registry is SNAPSHOTTED here, on the driver, and the
    snapshot travels inside the returned closure — module-global state does
    not exist in Ray worker processes, so reading ``_EXTRACTORS`` at batch
    time would silently ignore every registered extractor in a real build.
    """
    extractors = dict(_EXTRACTORS)

    def extract_batch(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        has_ids = "doc_id" in batch.column_names
        ids = batch.column("doc_id").to_pylist() if has_ids else None
        out_urls: list[str] = []
        out_texts: list[str] = []
        out_ids: list[int] = []
        for i, (url, html) in enumerate(zip(urls, htmls)):
            text = _dispatch(url, html, char_limit, extractors)
            if text is None:
                continue
            out_urls.append(url)
            out_texts.append(text)
            if has_ids:
                out_ids.append(ids[i])
        cols = {
            "url": pa.array(out_urls, type=pa.string()),
            "text": pa.array(out_texts, type=pa.large_string()),
        }
        if has_ids:
            cols = {"doc_id": pa.array(out_ids, type=pa.uint64()), **cols}
        return pa.table(cols)

    return extract_batch
