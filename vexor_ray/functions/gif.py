"""From-scratch GIF codec (stdlib-only): LZW decode + palette encode.

Spec: GIF89a (CompuServe, 1990; covered by W3C's public specification).
Decoder: header + logical screen descriptor, global/local color tables,
extension-block skipping, LZW decompression (variable code width, LSB-first
bit order, clear/EOI codes, 4096-entry table cap), interlace de-interleave;
first frame only, RGB output (transparency index ignored by design — the
engine's image features are channel means over opaque pixels).

Encoder exists to make fixtures: palette-quantized input (≤256 distinct
colors), standard LZW with clear-code resets at the table cap,
non-interlaced single frame.

Same role as ``functions/png.py`` / ``functions/jpeg.py``: the multimodal
``DecodeImage`` stage does REAL pixel decoding for GIF payloads without any
external imaging library (reference treats binary formats as extractor
plug-ins, ``vexor/services/content_extract_service.py:115-126``).
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def is_gif(payload: bytes) -> bool:
    return len(payload) > 13 and payload[:4] == b"GIF8" and payload[4:6] in (b"7a", b"9a")


# ---------------------------------------------------------------------------
# decode


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain starting at ``pos``; return (bytes, end)."""
    out = bytearray()
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        pos += n


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW: variable width from ``min_code_size + 1`` bits,
    LSB-first bit packing, table capped at 4096 codes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [(i,) for i in range(clear)] + [(), ()]
    table = list(base)
    width = min_code_size + 1
    out: list[int] = []
    prev: int | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = table[prev] + table[prev][:1]
            else:
                raise ValueError(f"corrupt LZW stream: code {code}")
            out.extend(entry)
            if prev is not None and len(table) < 4096:
                table.append(table[prev] + entry[:1])
            # width grows when the NEXT code to assign no longer fits
            if len(table) == (1 << width) and width < 12:
                width += 1
            prev = code
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF as an (H, W, 3) uint8 RGB array."""
    if not is_gif(payload):
        raise ValueError("not a GIF payload")
    width, height, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = np.frombuffer(payload[pos : pos + n], dtype=np.uint8).reshape(-1, 3)
        pos += n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-block chain
            pos += 1
            _, pos = _read_subblocks(payload, pos)
            continue
        if block == 0x3B:  # trailer
            break
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        table = gct
        if ipacked & 0x80:
            n = 3 * (2 << (ipacked & 0x07))
            table = np.frombuffer(payload[pos : pos + n], dtype=np.uint8).reshape(
                -1, 3
            )
            pos += n
        if table is None:
            raise ValueError("GIF image has no color table")
        min_code_size = payload[pos]
        pos += 1
        lzw, pos = _read_subblocks(payload, pos)
        idx = np.array(_lzw_decode(lzw, min_code_size)[: w * h], dtype=np.int32)
        if idx.size != w * h:
            raise ValueError("GIF pixel data truncated")
        rows = idx.reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            order = [
                r
                for start, step in _INTERLACE_PASSES
                for r in range(start, h, step)
            ]
            deinter = np.empty_like(rows)
            deinter[np.array(order)] = rows
            rows = deinter
        return table[rows]  # (h, w, 3) uint8
    raise ValueError("GIF contains no image block")


# ---------------------------------------------------------------------------
# encode (fixtures)


def encode_gif(arr: np.ndarray, *, interlace: bool = False) -> bytes:
    """Encode an (H, W, 3) uint8 array with ≤256 distinct colors as GIF89a."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    flat = arr.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif needs a palette-quantized image (<=256 colors)")
    gct_bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    gct_size = 1 << gct_bits
    gct = np.zeros((gct_size, 3), dtype=np.uint8)
    gct[: len(palette)] = palette

    rows = idx.reshape(h, w)
    if interlace:
        order = [
            r for start, step in _INTERLACE_PASSES for r in range(start, h, step)
        ]
        rows = rows[np.array(order)]
    pixels = rows.ravel().tolist()

    min_code_size = max(2, gct_bits)
    clear = 1 << min_code_size
    eoi = clear + 1

    out_bits = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out_bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width_bits = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    emit(clear, width_bits)
    prev: int | None = None
    for k in pixels:
        if prev is None:
            prev = k
            continue
        key = (prev, k)
        if key in table:
            prev = table[key]
            continue
        emit(prev, width_bits)
        table[key] = next_code
        next_code += 1
        # decoder alignment: it appends THIS code only while processing the
        # NEXT emission, so its size then is next_code-1; both sides widen
        # when the just-assigned code value reaches 2^width
        if next_code - 1 == (1 << width_bits) and width_bits < 12:
            width_bits += 1
        if next_code == 4096:
            emit(clear, width_bits)
            table.clear()
            width_bits = min_code_size + 1
            next_code = eoi + 1
        prev = k
    if prev is not None:
        emit(prev, width_bits)
    emit(eoi, width_bits)
    if nbits:
        out_bits.append(acc & 0xFF)

    buf = bytearray()
    buf += b"GIF89a"
    buf += struct.pack("<HHBBB", w, h, 0x80 | (gct_bits - 1), 0, 0)
    buf += gct.tobytes()
    buf += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0x00
    )
    buf.append(min_code_size)
    for i in range(0, len(out_bits), 255):
        chunk = out_bits[i : i + 255]
        buf.append(len(chunk))
        buf += chunk
    buf.append(0)  # sub-block terminator
    buf.append(0x3B)  # trailer
    return bytes(buf)
