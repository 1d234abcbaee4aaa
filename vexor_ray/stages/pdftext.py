"""Minimal from-scratch PDF text extraction (stdlib zlib only).

Covers the common machine-generated case: PDFs whose page content streams
are plain or FlateDecode-compressed, with text drawn via the ``Tj`` /
``TJ`` / ``'`` operators and literal ``(...)`` or hex ``<...>`` strings
(escape sequences and octal per PDF 32000-1 §7.3.4.2; hex per §7.3.4.3).
Object streams (``/Type /ObjStm``) are decompressed and scanned too, so
modern xref-stream PDFs whose page/font dicts live in object streams still
yield their content text (content streams themselves can never live inside
an ObjStm — §7.5.7 — so the linear stream scan finds them regardless).
Encrypted PDFs (``/Encrypt`` in the trailer) return ``None`` outright
rather than garbled ciphertext.  CID/Type0 composite fonts ARE supported
on unencrypted documents when they carry a ``/ToUnicode`` CMap (the
overwhelmingly common case for machine-generated CID PDFs): the object
graph is scanned for font dicts, each font name is bound to its parsed
CMap (``bfchar``/``bfrange``, codespace width from
``begincodespacerange``), and content streams track the active font via
the ``Tf`` operator, decoding its strings through the CMap.  A Type0 font
WITHOUT a usable ToUnicode map has its strings skipped entirely (never
garbled 2-byte soup); simple fonts keep the latin-1 path.  Encrypted CID
documents fall back to the simple-font path (the CMap streams are
object-encrypted and not re-associated after decryption).
``extract_pdf_text`` returns whatever text it can find, or ``None`` when
there is none (the extractor-registry contract: ``stages/extract.py``).

Register for the build with::

    from vexor_ray.stages.extract import register_extractor
    from vexor_ray.stages.pdftext import extract_pdf_text
    register_extractor((".pdf",), extract_pdf_text)
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.S)
_TEXT_OP_RE = re.compile(
    rb"(?:\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>)\s*(?:Tj|')"
    rb"|\[(?:[^\]\\]|\\.)*\]\s*TJ",
    re.S,
)
_LITERAL_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>", re.S)
_HEX_STRIP_RE = re.compile(rb"[^0-9A-Fa-f]")

_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


def _unescape(body: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = body[i + 1 : i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt.isdigit():  # octal, 1-3 digits
            j = i + 1
            while j < len(body) and j < i + 4 and body[j : j + 1].isdigit():
                j += 1
            out.append(int(body[i + 1 : j], 8) & 0xFF)
            i = j
        elif nxt in (b"\n", b"\r"):  # line continuation
            i += 2
        else:
            out += nxt
            i += 2
    return bytes(out)


def _content_streams(data: bytes, _depth: int = 0):
    """Yield decoded stream payloads (Flate-decompressed when marked).

    ``/Type /ObjStm`` container streams are decompressed and re-scanned
    (depth-capped): the objects inside are dicts only (§7.5.7), but their
    presence in the scan keeps any embedded string content reachable and
    makes the extractor insensitive to xref-stream-era object packing.
    """
    for m in _STREAM_RE.finditer(data):
        start = m.end()
        end = data.find(b"endstream", start)
        if end < 0:
            continue
        body = data[start:end].rstrip(b"\r\n")
        if b"/FlateDecode" in m.group(1):
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue
        if b"/ObjStm" in m.group(1):
            if _depth < 2:
                yield from _content_streams(body, _depth + 1)
            continue
        yield body


def _string_bytes(lit: bytes) -> bytes:
    """One PDF string token → raw bytes (literal escapes or hex pairs)."""
    if lit.startswith(b"<"):
        digits = _HEX_STRIP_RE.sub(b"", lit)
        if len(digits) % 2:  # odd count: final digit gets a trailing 0 (§7.3.4.3)
            digits += b"0"
        return bytes.fromhex(digits.decode("ascii"))
    return _unescape(lit[1:-1])


def _stream_text(stream: bytes, fonts: dict | None = None) -> list[str]:
    """Text pieces of one content stream.

    ``fonts``: font name (without slash) → parsed ToUnicode CMap
    ``(code_width, {code: str})``, or ``None`` for a Type0 font whose
    ToUnicode is absent/unusable (its strings are SKIPPED — 2-byte CIDs
    decoded as latin-1 would be garbage).  Names not in ``fonts`` are
    simple fonts → latin-1, the pre-CID behavior.
    """
    out: list[str] = []
    if not fonts:
        for m in _TEXT_OP_RE.finditer(stream):
            parts = [
                _string_bytes(lit.group(0))
                for lit in _LITERAL_RE.finditer(m.group(0))
            ]
            if parts:
                out.append(b"".join(parts).decode("latin-1"))
        return out
    cur: tuple | None | str = "simple"  # active font state
    for m in _TF_OR_TEXT_RE.finditer(stream):
        if m.group("tfname") is not None:
            name = m.group("tfname").decode("latin-1")
            cur = fonts[name] if name in fonts else "simple"
            continue
        if cur is None:
            continue  # Type0 without ToUnicode: skip its strings
        parts = [
            _string_bytes(lit.group(0))
            for lit in _LITERAL_RE.finditer(m.group(0))
        ]
        if not parts:
            continue
        raw = b"".join(parts)
        if cur == "simple":
            out.append(raw.decode("latin-1"))
        else:
            width, cmap = cur
            out.append(_decode_with_cmap(raw, width, cmap))
    return out


# Tf operator (font switch) OR a text-showing op, in stream order
_TF_OR_TEXT_RE = re.compile(
    rb"/(?P<tfname>[^\s/<>\[\]()]+)\s+[0-9.+-]+\s+Tf"
    rb"|(?:\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>)\s*(?:Tj|')"
    rb"|\[(?:[^\]\\]|\\.)*\]\s*TJ",
    re.S,
)


def _decode_with_cmap(raw: bytes, width: int, cmap: dict) -> str:
    """CID string bytes → text via the ToUnicode map (unmapped codes drop)."""
    out: list[str] = []
    for i in range(0, len(raw) - width + 1, width):
        code = int.from_bytes(raw[i : i + width], "big")
        u = cmap.get(code)
        if u:
            out.append(u)
    return "".join(out)


# ---------------------------------------------------------------------------
# CID/Type0 support: object graph → font name → parsed ToUnicode CMap
# ---------------------------------------------------------------------------

_OBJSTM_PAIR_RE = re.compile(rb"(\d+)\s+(\d+)")
_HEXTOK_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_CODESPACE_RE = re.compile(
    rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", re.S
)
_TYPE0_RE = re.compile(rb"/Subtype\s*/Type0\b")
_TOUNI_REF_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_FONTDICT_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.S)
_FONTREF_RE = re.compile(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R")


def _collect_objects(payload: bytes) -> dict[int, bytes]:
    """obj number → body bytes (top-level objects + ObjStm members)."""
    objs: dict[int, bytes] = {}
    for om in _OBJ_RE.finditer(payload):
        num = int(om.group(1))
        end = payload.find(b"endobj", om.end())
        body = payload[om.end() : end if end >= 0 else len(payload)]
        objs.setdefault(num, body)
    # expand object streams: header /N n /First f, then n (num, offset)
    # pairs followed by the packed dict bodies
    for m in _STREAM_RE.finditer(payload):
        head = m.group(1)
        if b"/ObjStm" not in head:
            continue
        start = m.end()
        end = payload.find(b"endstream", start)
        if end < 0:
            continue
        body = payload[start:end].rstrip(b"\r\n")
        if b"/FlateDecode" in head:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue
        nm = re.search(rb"/N\s+(\d+)", head)
        fm = re.search(rb"/First\s+(\d+)", head)
        if not nm or not fm:
            continue
        n, first = int(nm.group(1)), int(fm.group(1))
        pairs = _OBJSTM_PAIR_RE.findall(body[:first])[:n]
        offs = [(int(a), int(b)) for a, b in pairs]
        for i, (num, off) in enumerate(offs):
            nxt = offs[i + 1][1] if i + 1 < len(offs) else len(body) - first
            objs.setdefault(num, body[first + off : first + nxt])
    return objs


def _decoded_stream_of(body: bytes) -> bytes | None:
    """The (Flate-decoded) stream payload inside one object body."""
    m = _STREAM_RE.search(body)
    if not m:
        return None
    start = m.end()
    end = body.find(b"endstream", start)
    raw = body[start : end if end >= 0 else len(body)].rstrip(b"\r\n")
    if b"/FlateDecode" in m.group(1):
        try:
            raw = zlib.decompress(raw)
        except zlib.error:
            return None
    return raw


def _parse_tounicode(cmap_bytes: bytes) -> tuple[int, dict[int, str]] | None:
    """ToUnicode CMap → (code width, {code: unicode string}).

    Handles ``bfchar`` pairs, both ``bfrange`` forms (incrementing dst and
    explicit dst array), and takes the code width from the first
    ``codespacerange`` token (Identity-H's ``<0000> <FFFF>`` → 2)."""
    cs = _CODESPACE_RE.search(cmap_bytes)
    width = (len(cs.group(1)) + 1) // 2 if cs else 2
    out: dict[int, str] = {}

    def utf16(hexs: bytes) -> str:
        try:
            return bytes.fromhex(hexs.decode("ascii")).decode(
                "utf-16-be", "ignore"
            )
        except ValueError:
            return ""

    for sec in _BFCHAR_RE.finditer(cmap_bytes):
        toks = _HEXTOK_RE.findall(sec.group(1))
        for i in range(0, len(toks) - 1, 2):
            out[int(toks[i], 16)] = utf16(toks[i + 1])
    for sec in _BFRANGE_RE.finditer(cmap_bytes):
        body = sec.group(1)
        # explicit-array form: <lo> <hi> [<d0> <d1> ...]
        pos = 0
        while True:
            am = re.search(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\[[^\]]*\]|<[0-9A-Fa-f]+>)",
                body[pos:],
                re.S,
            )
            if not am:
                break
            lo, hi = int(am.group(1), 16), int(am.group(2), 16)
            dst = am.group(3)
            if dst.startswith(b"["):
                dsts = _HEXTOK_RE.findall(dst)
                for k, d in enumerate(dsts):
                    if lo + k > hi:
                        break
                    out[lo + k] = utf16(d)
            else:
                base_hex = dst[1:-1]
                base = int(base_hex, 16)
                # increment applies to the LAST code unit (PDF 32000-1
                # §9.10.3); spans beyond it are clipped defensively
                n_units = max(1, (len(base_hex) + 3) // 4)
                for k in range(hi - lo + 1):
                    val = base + k
                    try:
                        out[lo + k] = val.to_bytes(
                            2 * n_units, "big"
                        ).decode("utf-16-be", "ignore")
                    except OverflowError:
                        break
            pos += am.end()
    return (width, out) if out else None


def _font_cmaps(payload: bytes) -> dict[str, tuple | None]:
    """Font NAME → parsed ToUnicode CMap for every Type0 font, ``None``
    when the font is Type0 but its map is absent/unusable (skip its text).
    Names bound in any ``/Font`` resource dict; a name bound to multiple
    DIFFERENT Type0 fonts keeps the first (rare; simple fonts win ties
    by absence).  Returns {} when the document has no Type0 fonts at all —
    the caller then skips font tracking entirely."""
    objs = _collect_objects(payload)
    type0: dict[int, tuple | None] = {}
    for num, body in objs.items():
        head = body.split(b"stream", 1)[0]
        if not _TYPE0_RE.search(head):
            continue
        ref = _TOUNI_REF_RE.search(head)
        parsed = None
        if ref:
            tobj = objs.get(int(ref.group(1)))
            if tobj is not None:
                raw = _decoded_stream_of(tobj)
                if raw:
                    parsed = _parse_tounicode(raw)
        type0[num] = parsed
    if not type0:
        return {}
    # collect EVERY binding per name first: a name bound to both a Type0
    # font (page A) and a simple font (page B) is ambiguous under the
    # document-global lookup, so it stays unregistered — simple-font text
    # keeps the latin-1 path for both pages (the CID page falls back to
    # pre-CID behavior rather than corrupting the simple page's text)
    refs_by_name: dict[str, set[int]] = {}
    for body in objs.values():
        for fd in _FONTDICT_RE.finditer(body):
            for fm in _FONTREF_RE.finditer(fd.group(1)):
                name = fm.group(1).decode("latin-1")
                refs_by_name.setdefault(name, set()).add(int(fm.group(2)))
    fonts: dict[str, tuple | None] = {}
    for name, refs in refs_by_name.items():
        if all(r in type0 for r in refs):
            fonts[name] = type0[sorted(refs)[0]]
    return fonts


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def _decrypted_streams(payload: bytes, crypto) -> "Iterator[bytes]":
    """Stream payloads of an encrypted document, decrypted per object.

    Streams are encrypted whole with the per-object key (§7.6.2); xref
    streams are never encrypted (§7.5.8.2) and are skipped; ObjStm
    containers decrypt at the container level — the objects inside carry
    no second layer, so the plain scanner handles their contents.
    """
    for om in _OBJ_RE.finditer(payload):
        num, gen = int(om.group(1)), int(om.group(2))
        end_obj = payload.find(b"endobj", om.end())
        body = payload[om.end() : end_obj if end_obj >= 0 else len(payload)]
        for m in _STREAM_RE.finditer(body):
            if b"/XRef" in m.group(1):
                continue  # xref streams are not encrypted
            start = m.end()
            end = body.find(b"endstream", start)
            if end < 0:
                continue
            raw = body[start:end].rstrip(b"\r\n")
            raw = crypto.decrypt_stream(raw, num, gen)
            if b"/FlateDecode" in m.group(1):
                try:
                    raw = zlib.decompress(raw)
                except zlib.error:
                    continue
            if b"/ObjStm" in m.group(1):
                yield from _content_streams(raw, 1)
                continue
            yield raw


def extract_pdf_text(payload: bytes, char_limit: int = 0) -> str | None:
    """PDF bytes → extracted text (None when no text was found).

    Encrypted documents (standard security handler, empty user password —
    RC4-40/128, AES-128 and AES-256, ``stages/pdfcrypt.py``) are decrypted in
    place; password-protected or unsupported encryption refuses cleanly
    (returns None) instead of emitting ciphertext garbage.  The encryption
    probe parses only the trailer / xref-stream dictionaries, so content
    that merely *contains* the bytes ``/Encrypt N G R`` is not refused.
    """
    if not payload or not payload.startswith(b"%PDF-"):
        return None
    from .pdfcrypt import REFUSED, examine

    crypto = examine(payload)
    if crypto is REFUSED:
        return None
    if crypto is None:
        streams = _content_streams(payload)
        # CID/Type0: font-name → ToUnicode CMap bindings.  The byte probe
        # keeps the common no-composite-font case at its pre-CID cost —
        # the object-graph scan runs only when /Type0 can plausibly occur
        # (verbatim, or hidden inside a compressed object stream)
        fonts = (
            _font_cmaps(payload)
            if (b"/Type0" in payload or b"/ObjStm" in payload)
            else {}
        )
    else:
        streams = _decrypted_streams(payload, crypto)
        fonts = {}
    pieces: list[str] = []
    for stream in streams:
        if b"Tj" not in stream and b"TJ" not in stream and b"'" not in stream:
            continue
        pieces.extend(_stream_text(stream, fonts))
    if not pieces:
        return None
    text = " ".join(p.strip() for p in pieces if p.strip())
    if not text:
        return None
    if char_limit and char_limit > 0:
        text = text[:char_limit]
    from ..refimpl.textnorm import normalize_text

    return normalize_text(text) or None


def make_encrypted_pdf(
    lines: list[str],
    method: str = "rc4-128",
    user_password: bytes = b"",
    owner_password: bytes = b"owner",
    compress: bool = True,
) -> bytes:
    """Properly encrypted one-page PDF (test fixture).

    ``method``: ``rc4-40`` (V=1/R=2), ``rc4-128`` (V=2/R=3), ``aes-128``
    (V=4/R=4 ``/CFM /AESV2``), ``aes-256`` (V=5/R=6 ``/CFM /AESV3``) or
    ``aes-256-r5`` (the deprecated Adobe R=5 variant).  A non-empty
    ``user_password`` produces a document the extractor must REFUSE
    (empty-user-password check fails).
    """
    import hashlib

    from .pdfcrypt import (
        PdfCrypto,
        cbc_encrypt_nopad,
        compute_file_key,
        compute_o_value,
        compute_u_value,
        hash_2b,
    )

    v, r, bits = {
        "rc4-40": (1, 2, 40),
        "rc4-128": (2, 3, 128),
        "aes-128": (4, 4, 128),
        "aes-256": (5, 6, 256),
        "aes-256-r5": (5, 5, 256),
    }[method]
    n = bits // 8
    p = -3904  # typical permissions mask
    id0 = hashlib.md5(b"fixture-id|" + "|".join(lines).encode()).digest()
    if v == 5:
        # ISO 32000-2 user/owner entries: U/O = hash(32)+vsalt(8)+ksalt(8),
        # UE/OE = file key CBC-encrypted (zero IV) under the intermediate key
        def _h(pwd: bytes, salt: bytes, ud: bytes = b"") -> bytes:
            if r == 5:
                return hashlib.sha256(pwd[:127] + salt + ud).digest()
            return hash_2b(pwd[:127], salt, ud)

        file_key = hashlib.sha256(b"fixture-filekey|" + id0).digest()
        salts = hashlib.sha256(b"fixture-salts|" + id0).digest()
        uvs, uks, ovs, oks = (salts[i : i + 8] for i in range(0, 32, 8))
        u = _h(user_password, uvs) + uvs + uks
        ue = cbc_encrypt_nopad(_h(user_password, uks), bytes(16), file_key)
        o = _h(owner_password, ovs, u) + ovs + oks
        oe = cbc_encrypt_nopad(_h(owner_password, oks, u), bytes(16), file_key)
        crypto = PdfCrypto(file_key, aes_streams=True, aes_strings=True, v5=True)
    else:
        o = compute_o_value(owner_password, user_password, r, n)
        file_key = compute_file_key(user_password, o, p, id0, r, n)
        u = compute_u_value(file_key, id0, r)
        crypto = PdfCrypto(file_key, aes_streams=(method == "aes-128"))

    esc = [
        line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        for line in lines
    ]
    content = b"BT /F1 12 Tf 72 720 Td " + b" T* ".join(
        f"({e}) Tj".encode("latin-1") for e in esc
    ) + b" ET"
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    iv = hashlib.md5(b"iv|" + id0).digest()
    content = crypto.encrypt_stream(content, 4, 0, iv=iv)

    enc_extra = b""
    if v == 4:
        enc_extra = (
            b" /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >>"
            b" /StmF /StdCF /StrF /StdCF"
        )
    elif v == 5:
        enc_extra = (
            b" /CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >>"
            b" /StmF /StdCF /StrF /StdCF /OE <%s> /UE <%s>"
            % (oe.hex().encode(), ue.hex().encode())
        )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>",
        b"<< "
        + filt
        + b"/Length "
        + str(len(content)).encode()
        + b" >>\nstream\n"
        + content
        + b"\nendstream",
        b"<< /Filter /Standard /V %d /R %d /Length %d /P %d /O <%s> /U <%s>%s >>"
        % (v, r, bits, p, o.hex().encode(), u.hex().encode(), enc_extra),
    ]
    out = bytearray(b"%PDF-1.6\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size "
        + str(len(objs) + 1).encode()
        + b" /Root 1 0 R /Encrypt 5 0 R /ID [<"
        + id0.hex().encode()
        + b"> <"
        + id0.hex().encode()
        + b">] >>\nstartxref\n"
        + str(xref_at).encode()
        + b"\n%%EOF\n"
    )
    return bytes(out)


def make_simple_pdf(lines: list[str], compress: bool = True) -> bytes:
    """Build a minimal valid one-page PDF showing ``lines`` (test fixture)."""
    esc = [
        line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        for line in lines
    ]
    content = b"BT /F1 12 Tf 72 720 Td " + b" T* ".join(
        f"({e}) Tj".encode("latin-1") for e in esc
    ) + b" ET"
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>",
        b"<< "
        + filt
        + b"/Length "
        + str(len(content)).encode()
        + b" >>\nstream\n"
        + content
        + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size "
        + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n"
        + str(xref_at).encode()
        + b"\n%%EOF\n"
    )
    return bytes(out)


def make_cid_pdf(
    lines: list[str],
    *,
    cid_offset: int = 0x100,
    with_tounicode: bool = True,
    compress: bool = True,
) -> bytes:
    """One-page PDF whose text uses a CID/Type0 font (Identity-H): each
    character is written as the 2-byte code ``ord(ch) + cid_offset``, so a
    naive latin-1 decode of the string bytes would be garbage — correct
    extraction REQUIRES the ToUnicode CMap (test fixture).

    ``with_tounicode=False`` builds the refusal case: a Type0 font without
    a usable map, whose strings the extractor must skip entirely.
    """
    hexes = [
        "".join(f"{ord(ch) + cid_offset:04X}" for ch in line) for line in lines
    ]
    content = b"BT /F9 12 Tf 72 720 Td " + b" T* ".join(
        f"<{h}> Tj".encode("ascii") for h in hexes
    ) + b" ET"
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    # ToUnicode CMap: one bfrange covering the printable ASCII band shifted
    # by cid_offset (dst increments from U+0020)
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"begincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"1 beginbfrange\n"
        + f"<{0x20 + cid_offset:04X}> <{0x7E + cid_offset:04X}> <0020>\n".encode()
        + b"endbfrange\nendcmap\nend\n"
    )
    font = b"<< /Type /Font /Subtype /Type0 /BaseFont /Stub-Identity-H "
    font += b"/Encoding /Identity-H "
    if with_tounicode:
        font += b"/ToUnicode 6 0 R "
    font += b">>"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F9 5 0 R >> >> /Contents 4 0 R >>",
        b"<< "
        + filt
        + b"/Length "
        + str(len(content)).encode()
        + b" >>\nstream\n"
        + content
        + b"\nendstream",
        font,
        b"<< /Length "
        + str(len(cmap)).encode()
        + b" >>\nstream\n"
        + cmap
        + b"\nendstream",
    ]
    if not with_tounicode:
        objs = objs[:5]
    out = bytearray(b"%PDF-1.5\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size "
        + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n"
        + str(xref_at).encode()
        + b"\n%%EOF\n"
    )
    return bytes(out)
