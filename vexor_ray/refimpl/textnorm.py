"""Pure deterministic html→text extraction / normalization (the oracle side).

Semantics mirror the reference's text pipeline (SURVEY.md ⚠8):

- byte-capped read + incremental UTF-8 decode with ``final=False`` so a
  truncated multi-byte tail is tolerated (reference
  ``content_extract_service.py:752-768``); hard decode errors fall back to
  charset detection over the full payload (``decode_charset_fallback``,
  reference ``content_extract_service.py:726-749``) instead of dropping the
  page;
- byte cap = ``char_limit * 4`` (``UTF8_BYTE_MULTIPLIER``,
  ``content_extract_service.py:17``), char cap = ``FULL_CHAR_LIMIT``
  (``content_extract_service.py:14``);
- normalization ``text.replace("\\r\\n", "\\n").strip()``
  (``content_extract_service.py:152,200``);
- NO html tag stripping: the reference treats ``.html`` as plain text
  (``content_extract_service.py:73-74``), so ours does too;
- sliding-window chunking size 1000 / overlap 100, each window stripped and
  dropped when empty (``content_extract_service.py:155-167``);
- snippet cleanup: strip lines, drop blanks, join with single spaces
  (``content_extract_service.py:876-879``).

These are *Python string semantics* on purpose — ``str.strip`` /
``str.splitlines`` Unicode behavior differs from Arrow kernels, and the
byte-identical-per-url invariant binds both engine and oracle to exactly
these functions.  The Ray engine imports and calls these same functions
inside ``map_batches``; there is one implementation, not two.
"""

from __future__ import annotations

import codecs

from ..spec import (
    DEFAULT_CHUNK_OVERLAP,
    DEFAULT_CHUNK_SIZE,
    FULL_CHAR_LIMIT,
    UTF8_BYTE_MULTIPLIER,
)


def decode_utf8(data: bytes, char_limit: int = FULL_CHAR_LIMIT) -> str | None:
    """Byte-capped incremental UTF-8 decode. ``None`` on error or empty."""
    if char_limit > 0:
        data = data[: char_limit * UTF8_BYTE_MULTIPLIER]
    decoder = codecs.getincrementaldecoder("utf-8")()
    try:
        text = decoder.decode(data, final=False)
    except UnicodeDecodeError:
        return None
    if text == "":
        return None
    if char_limit > 0:
        return text[:char_limit]
    return text


def decode_charset_fallback(data: bytes, char_limit: int = FULL_CHAR_LIMIT) -> str | None:
    """Charset-detection fallback for non-UTF-8 payloads.

    Mirrors the reference's legacy-encoding arm
    (``content_extract_service.py:726-749``): when the strict UTF-8 decode
    fails, run ``charset_normalizer`` over the FULL payload (the reference's
    ``from_path`` reads the whole file — no byte cap on this arm) and take
    ``str(result.best())``, char-capped afterwards.  Deterministic: pure
    function of the bytes for a fixed package version, and the engine and the
    oracle both call THIS function, so byte-identity per url holds by
    construction.

    If the package is absent the deterministic builtin arm takes over:
    BOM-sniffed UTF-16/UTF-32, else cp1252 with latin-1 as the total
    last-resort (every byte decodes) — spec-pinned so behavior cannot drift.
    """
    if not data:
        return None
    text: str | None = None
    try:
        from charset_normalizer import from_bytes

        best = from_bytes(data).best()
        if best is not None:
            text = str(best)
    except Exception:
        text = None
    if text is None:
        text = _decode_builtin_fallback(data)
    if not text:
        return None
    if char_limit > 0:
        return text[:char_limit]
    return text


_BOM_CODECS = (
    # Order matters: UTF-32 BOMs start with the UTF-16 BOM bytes.
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)


def _decode_builtin_fallback(data: bytes) -> str | None:
    """No-dependency deterministic decode: BOM sniff, else cp1252→latin-1."""
    for bom, name in _BOM_CODECS:
        if data.startswith(bom):
            try:
                return data[len(bom) :].decode(name)
            except UnicodeDecodeError:
                return None
    try:
        return data.decode("cp1252")
    except UnicodeDecodeError:
        return data.decode("latin-1")


def decode_text(data: bytes, char_limit: int = FULL_CHAR_LIMIT) -> str | None:
    """Strict UTF-8 first; charset-detection fallback on hard decode errors.

    The reference's two-arm read (``_read_text_full``,
    ``content_extract_service.py:726-749``).
    """
    text = decode_utf8(data, char_limit)
    if text is not None:
        return text
    return decode_charset_fallback(data, char_limit)


def normalize_text(text: str) -> str:
    """CRLF→LF then strip — the reference's chunk-level normalization."""
    return text.replace("\r\n", "\n").strip()


def extract_text(html: bytes | None, char_limit: int = FULL_CHAR_LIMIT) -> str | None:
    """html bytes → normalized text, or ``None`` when the page yields nothing.

    This is THE extraction function: byte-identical per url between the Ray
    engine and the oracle because both call this exact code.
    """
    if html is None:
        return None
    text = decode_text(html, char_limit)
    if text is None:
        return None
    normalized = normalize_text(text)
    return normalized or None


def cleanup_snippet(snippet: str) -> str | None:
    """Strip each line, drop blanks, join with single spaces."""
    lines = [line.strip() for line in snippet.splitlines() if line.strip()]
    joined = " ".join(lines)
    return joined or None


PREVIEW_CHAR_LIMIT = 160


def make_preview(text: str, limit: int = PREVIEW_CHAR_LIMIT) -> str:
    """Collapse whitespace, cap at ``limit`` chars with an ellipsis.

    Mirrors the reference's preview normalization + trim
    (``modes.py:318-331``, ``PREVIEW_CHAR_LIMIT = 160``).
    """
    collapsed = " ".join(text.split())
    if len(collapsed) <= limit:
        return collapsed
    return collapsed[: limit - 1].rstrip() + "…"


def head_snippet(text: str, char_limit: int = 1000) -> str | None:
    """First ``char_limit`` chars, line-collapsed — the head-mode document."""
    return cleanup_snippet(text[:char_limit])


def chunk_text(
    text: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> list[str]:
    """Sliding-window chunks over already-normalized text."""
    normalized = normalize_text(text)
    if not normalized:
        return []
    size = max(int(chunk_size), 1)
    stride = max(size - max(int(overlap), 0), 1)
    chunks: list[str] = []
    start = 0
    length = len(normalized)
    while start < length:
        window = normalized[start : start + size].strip()
        if window:
            chunks.append(window)
        if start + size >= length:
            break
        start += stride
    return chunks
