"""Posting-list compression: delta + LEB128 varint, block skips, block-max.

Layout per (term, salt) chunk — docIDs strictly ascending:

- ``doc_blob``: varint of docID deltas (``delta[0] = doc[0]``); blocks of
  ``POSTING_BLOCK_SIZE`` postings are independently decodable because block
  ``b``'s base docID is ``block_last[b-1]`` from the skip array.
- ``tf_blob`` / ``dl_blob``: varint of raw term frequencies / doc lengths
  (doc_len travels inline with the posting, mirroring the reference's
  posting tuple ``(chunk_id, tf, doc_len)`` — ``vexor/cache.py:1519-1527`` —
  so the query layer never joins against a doc-stats table).
- per-block byte offsets into each blob (``*_off``, length ``n_blocks + 1``),
  ``block_last`` (last docID per block, the skip pointer), and ``block_ub``:
  the *idf-free* BM25 upper bound ``max tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))``
  over the block.  Storing it idf-free decouples block metadata from global
  document frequency: the query layer multiplies by the term's idf, so a
  salted term's df (summed across chunks) never has to be known at build
  time.

Both encode and decode are numpy-vectorized (no per-posting Python loop):
encode scatters 7-bit groups into a preallocated byte array; decode finds
value boundaries from the continuation bits and reassembles ≤10 byte groups
with a fixed small loop over byte positions.
"""

from __future__ import annotations

import numpy as np

from ..spec import BM25_B, BM25_K1, POSTING_BLOCK_SIZE

_U64 = np.uint64
_MAX_VARINT_BYTES = 10

# posting-stream codecs (BuildConfig.posting_codec, recorded in the
# manifest config — an index is single-codec because any config change
# forces its waves to rebuild).  "pfor" is the patched-frame-of-reference
# family: per block, values are bit-packed at the width covering all but
# <= m/8 outliers, and the outliers ("exceptions") patch their high bits
# back from a varint sidecar.  The impact-ordered companion streams
# (imp_*) always stay varint — only head blocks are ever decoded there.
CODEC_VARINT = "varint"
CODEC_PFOR = "pfor"


def varint_encode_with_sizes(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode a uint64 array; also return per-value byte sizes."""
    v = np.ascontiguousarray(values, dtype=_U64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    nbytes = np.ones(v.shape, dtype=np.int64)
    for i in range(1, _MAX_VARINT_BYTES):
        nbytes += (v >= (_U64(1) << _U64(7 * i))).astype(np.int64)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(_MAX_VARINT_BYTES):
        sel = nbytes > j
        if not sel.any():
            break
        byte = ((v[sel] >> _U64(7 * j)) & _U64(0x7F)).astype(np.uint8)
        cont = (nbytes[sel] != j + 1).astype(np.uint8) << 7
        out[starts[sel] + j] = byte | cont
    return out.tobytes(), nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized)."""
    return varint_encode_with_sizes(values)[0]


def ub_float32(values: np.ndarray) -> np.ndarray:
    """float64 upper bounds → float32 rounded UP (never below the true max).

    A plain cast can round down by one ulp, which would let block-max WAND
    prune a doc that exactly ties the heap threshold — rank-unsafe.
    """
    f32 = np.asarray(values, dtype=np.float32)
    low = f32.astype(np.float64) < np.asarray(values, dtype=np.float64)
    f32[low] = np.nextafter(f32[low], np.float32(np.inf))
    return f32


def varint_decode(buf: bytes | memoryview) -> np.ndarray:
    """Decode an LEB128 byte stream back to a uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=_U64)
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(ends.size, dtype=_U64)
    for j in range(int(lengths.max())):
        sel = lengths > j
        vals[sel] |= (b[starts[sel] + j] & 0x7F).astype(_U64) << _U64(7 * j)
    return vals


_POW2 = (_U64(1) << np.arange(64, dtype=_U64)).astype(_U64)


def _bit_lengths(v: np.ndarray) -> np.ndarray:
    """Per-value bit length of a uint64 array (0 for 0), one searchsorted."""
    return np.searchsorted(_POW2, v, side="right").astype(np.int64)


def pfor_encode_blocks(
    values: np.ndarray,
    block_starts: np.ndarray,
    block_ends: np.ndarray,
) -> tuple[bytes, np.ndarray]:
    """Patched-frame-of-reference encode of per-block value slices.

    Per block of ``m`` uint64 values::

        [0]            width b (uint8, 0..64)
        [1]            n_exc  (uint8; exceptions, <= m // 8)
        [2 : 2+ceil(m*b/8)]   low b bits of every value, LSB-first bitstream
        [... + n_exc]  exception positions within the block (uint8)
        [... end]      exception high parts (value >> b) as LEB128 varints

    ``b`` is the exact (m-1-m//8)-th order statistic of the block's bit
    lengths — the smallest width leaving at most m//8 exceptions.  Every
    step below is vectorized across ALL blocks (one lexsort for the order
    statistics, one ``np.packbits`` per bounded slab for the bitstreams,
    one varint pass for all exception highs).

    Returns ``(buffer, per_block_byte_sizes)``.
    """
    v = np.ascontiguousarray(values, dtype=_U64)
    starts = np.asarray(block_starts, dtype=np.int64)
    ends = np.asarray(block_ends, dtype=np.int64)
    K = starts.size
    m = ends - starts
    n = int(v.size)
    if n == 0 or K == 0:
        return b"", np.zeros(K, dtype=np.int64)
    if int(m.max()) > 256:
        raise ValueError("pfor blocks must hold <= 256 values (uint8 pos)")
    rep = np.repeat(np.arange(K, dtype=np.int64), m)

    L = _bit_lengths(v)
    # per-block width = the smallest w whose exception count (#values with
    # L > w) is <= m//8 — from one bincount histogram of (block, L) pairs
    # and a reversed cumsum, no sort
    e_allow = m // 8
    hist = np.bincount(rep * 65 + L, minlength=K * 65).reshape(K, 65)
    tail = hist[:, ::-1].cumsum(axis=1)[:, ::-1]  # tail[k,l] = #(L >= l)
    exc_if = np.zeros((K, 65), dtype=np.int64)
    exc_if[:, :-1] = tail[:, 1:]  # exceptions at width l = #(L > l)
    b = np.argmax(exc_if <= e_allow[:, None], axis=1).astype(np.uint8)
    b_rep = b[rep]

    is_exc = L > b_rep  # count per block <= e_allow by the order statistic
    n_exc = np.bincount(rep[is_exc], minlength=K).astype(np.int64)
    # exceptions imply b < L <= 64, so the shift below never reaches 64
    exc_idx = np.flatnonzero(is_exc)
    exc_high = v[exc_idx] >> b_rep[exc_idx].astype(_U64)
    exc_pos = (exc_idx - starts[rep[exc_idx]]).astype(np.uint8)
    hi_buf, hi_sizes = varint_encode_with_sizes(exc_high)
    hi_bytes = np.zeros(K, dtype=np.int64)
    np.add.at(hi_bytes, rep[exc_idx], hi_sizes)

    packed_bytes = (m * b.astype(np.int64) + 7) // 8
    total = 2 + packed_bytes + n_exc + hi_bytes
    off = np.zeros(K + 1, dtype=np.int64)
    np.cumsum(total, out=off[1:])
    # +8 pad: a value's shifted-byte window may graze past its packed
    # section with ZERO bytes (value < 2^b, so bits beyond (i+1)*b are 0);
    # OR-ing zeros into following sections is harmless, and the pad absorbs
    # the very last window
    out = np.zeros(int(off[-1]) + 8, dtype=np.uint8)

    # headers
    out[off[:K]] = b
    out[off[:K] + 1] = n_exc.astype(np.uint8)

    # low-bit bitstreams, packed in uint64 WORD space per width group: all
    # blocks of width w pack together — a [G, n_words] word matrix where
    # value i of every block lands at word (i*w)//64 shift (i*w)%64 (plus a
    # spill word when it straddles) — one short loop over the ≤block_size
    # value positions, every iteration a G-wide vector op.  The packed
    # section of block g is then the first ceil(m_g*w/8) bytes of its
    # (little-endian) word row, scattered into ``out`` in one shot.
    low_mask = np.where(
        b_rep < 64,
        (_U64(1) << b_rep.astype(_U64)) - _U64(1),
        ~_U64(0),
    )
    low = v & low_mask
    for width in np.unique(b):
        w = int(width)
        if w == 0:
            continue
        blks = np.flatnonzero(b == width)
        mg = m[blks]
        m_max = int(mg.max())
        G = blks.size
        n_words = (m_max * w + 63) // 64 + 1
        words = np.zeros((G, n_words), dtype=_U64)
        # padded value matrix [G, m_max]
        V = np.zeros((G, m_max), dtype=_U64)
        vsel = np.repeat(starts[blks], mg) + (
            np.arange(int(mg.sum())) - np.repeat(np.cumsum(mg) - mg, mg)
        )
        row = np.repeat(np.arange(G), mg)
        col = np.arange(int(mg.sum())) - np.repeat(np.cumsum(mg) - mg, mg)
        V[row, col] = low[vsel]
        for i in range(m_max):
            wi, sh = divmod(i * w, 64)
            col_v = V[:, i]
            words[:, wi] |= col_v << _U64(sh)
            if sh + w > 64:
                words[:, wi + 1] |= col_v >> _U64(64 - sh)
        wbytes = words.view(np.uint8).reshape(G, n_words * 8)
        pk = packed_bytes[blks]
        pk_cum = np.zeros(G + 1, dtype=np.int64)
        np.cumsum(pk, out=pk_cum[1:])
        within_b = np.arange(int(pk_cum[-1])) - np.repeat(pk_cum[:-1], pk)
        src = wbytes[np.repeat(np.arange(G), pk), within_b]
        tgt = np.repeat(off[blks] + 2, pk) + within_b
        out[tgt] = src

    # exception positions + high-part varints
    if exc_idx.size:
        exc_blk = rep[exc_idx]
        within = np.arange(exc_idx.size, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(n_exc)[:-1]]), n_exc
        )
        pos_sec = off[:K] + 2 + packed_bytes
        out[pos_sec[exc_blk] + within] = exc_pos
        hi_sec = pos_sec + n_exc
        blk_hi_start = np.zeros(K, dtype=np.int64)
        np.cumsum(hi_bytes[:-1], out=blk_hi_start[1:])
        hi_cum = np.zeros(exc_idx.size + 1, dtype=np.int64)
        np.cumsum(hi_sizes, out=hi_cum[1:])
        per_exc_tgt = hi_sec[exc_blk] + (hi_cum[:-1] - blk_hi_start[exc_blk])
        tgt = np.repeat(per_exc_tgt, hi_sizes) + (
            np.arange(int(hi_cum[-1])) - np.repeat(hi_cum[:-1], hi_sizes)
        )
        out[tgt] = np.frombuffer(hi_buf, dtype=np.uint8)
    return out[: int(off[-1])].tobytes(), total


def pfor_decode_values(
    blob: bytes | memoryview,
    offs: np.ndarray,
    n_postings: int,
    block_size: int,
    from_block: int = 0,
    to_block: int | None = None,
) -> np.ndarray:
    """Decode blocks ``[from_block, to_block)`` of a PFor stream → uint64.

    ``offs`` is the chunk's per-block byte-offset array (``n_blocks + 1``
    entries, relative to the blob start — the same ``*_off`` layout the
    varint scheme stores), so no header walking is needed.  Decoding is
    grouped by width: one gather + shift-or pass per distinct width, one
    small loop over the (rare) blocks that carry exceptions.
    """
    arr = np.frombuffer(blob, dtype=np.uint8)
    offs = np.asarray(offs, dtype=np.int64)
    K = offs.size - 1
    if to_block is None:
        to_block = K
    nb = to_block - from_block
    if nb <= 0 or n_postings == 0:
        return np.zeros(0, dtype=_U64)
    m = np.full(K, block_size, dtype=np.int64)
    m[K - 1] = n_postings - (K - 1) * block_size
    m = m[from_block:to_block]
    o = offs[from_block:to_block]
    b = arr[o].astype(np.int64)
    n_exc = arr[o + 1].astype(np.int64)
    packed_bytes = (m * b + 7) // 8
    out = np.zeros(int(m.sum()), dtype=_U64)
    val_start = np.zeros(nb, dtype=np.int64)
    np.cumsum(m[:-1], out=val_start[1:])

    lo_byte = int(o.min())
    hi_byte = int(offs[to_block])
    # padded local window so every value's 8-byte read stays in bounds
    window = np.zeros(hi_byte - lo_byte + 8, dtype=np.uint8)
    window[: hi_byte - lo_byte] = arr[lo_byte:hi_byte]
    for width in np.unique(b):
        w = int(width)
        if w == 0:
            continue
        sel = np.flatnonzero(b == width)
        mm = m[sel]
        within = np.arange(int(mm.sum())) - np.repeat(np.cumsum(mm) - mm, mm)
        base_bit = np.repeat((o[sel] + 2 - lo_byte) * 8, mm) + within * w
        tgt = np.repeat(val_start[sel], mm) + within
        if w <= 56:
            # gather each value's byte window (only the lanes the width can
            # span), assemble little-endian, shift and mask
            lanes = (7 + w - 1) // 8 + 1
            p = base_bit >> 3
            g = window[p[:, None] + np.arange(lanes)[None, :]]
            raw = np.zeros(p.size, dtype=_U64)
            for j in range(lanes):
                raw |= g[:, j].astype(_U64) << _U64(8 * j)
            vals = (raw >> (base_bit & 7).astype(_U64)) & (
                (_U64(1) << _U64(w)) - _U64(1)
            )
        else:
            mask = (
                (_U64(1) << _U64(w)) - _U64(1) if w < 64 else ~_U64(0)
            )
            vals = np.zeros(base_bit.size, dtype=_U64)
            for j in range(w):
                bitpos = base_bit + j
                bit = (window[bitpos >> 3] >> (bitpos & 7).astype(np.uint8)) & 1
                vals |= bit.astype(_U64) << _U64(j)
            vals &= mask
        out[tgt] = vals
    # exceptions, vectorized across blocks: gather all position bytes and
    # all high-part varint sections with the repeat trick, decode the
    # concatenated varints once, patch with a per-exception shift
    exc_blocks = np.flatnonzero(n_exc)
    if exc_blocks.size:
        ne = n_exc[exc_blocks]
        pos_sec = o[exc_blocks] + 2 + packed_bytes[exc_blocks]
        within_e = np.arange(int(ne.sum())) - np.repeat(np.cumsum(ne) - ne, ne)
        pos = arr[np.repeat(pos_sec, ne) + within_e].astype(np.int64)
        hi_start = pos_sec + ne
        hi_len = offs[from_block + exc_blocks + 1] - hi_start
        wb = np.arange(int(hi_len.sum())) - np.repeat(
            np.cumsum(hi_len) - hi_len, hi_len
        )
        hi_stream = arr[np.repeat(hi_start, hi_len) + wb]
        highs = varint_decode(hi_stream.tobytes())
        blk_of_exc = np.repeat(exc_blocks, ne)
        out[val_start[blk_of_exc] + pos] |= highs << b[blk_of_exc].astype(
            _U64
        )
    return out


def bm25_tf_component(
    tfs: np.ndarray,
    dls: np.ndarray,
    avg_doc_len: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> np.ndarray:
    """Idf-free per-posting BM25 contribution (float64)."""
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avg_doc_len))


def encode_chunk(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avg_doc_len: float,
    block_size: int = POSTING_BLOCK_SIZE,
    k1: float = BM25_K1,
    b: float = BM25_B,
    impact: bool = False,
    codec: str = CODEC_VARINT,
) -> dict:
    """Encode one (term, salt) posting chunk. docIDs must be ascending.

    ``impact=True`` additionally emits the impact-ordered companion layout
    (``encode_impact``) used by the Threshold-Algorithm scorer.
    ``codec="pfor"`` bit-packs the three posting streams per block
    (``pfor_encode_blocks``); block metadata is codec-independent."""
    n = int(doc_ids.size)
    doc_ids = np.ascontiguousarray(doc_ids, dtype=_U64)
    tfs = np.ascontiguousarray(tfs, dtype=_U64)
    dls = np.ascontiguousarray(dls, dtype=_U64)
    deltas = np.empty(n, dtype=_U64)
    if n:
        deltas[0] = doc_ids[0]
        np.subtract(doc_ids[1:], doc_ids[:-1], out=deltas[1:])
    n_blocks = (n + block_size - 1) // block_size if n else 0
    block_bounds = [min((bk + 1) * block_size, n) for bk in range(n_blocks)]
    block_starts = [bk * block_size for bk in range(n_blocks)]

    doc_parts: list[bytes] = []
    tf_parts: list[bytes] = []
    dl_parts: list[bytes] = []
    block_last = np.zeros(n_blocks, dtype=_U64)
    block_ub = np.zeros(n_blocks, dtype=np.float32)
    comp = bm25_tf_component(tfs, dls, avg_doc_len, k1, b) if n else np.zeros(0)
    if codec == CODEC_PFOR:
        bs_arr = np.asarray(block_starts, dtype=np.int64)
        be_arr = np.asarray(block_bounds, dtype=np.int64)
        blobs: dict[str, bytes] = {}
        offsets: dict[str, np.ndarray] = {}
        for name, stream in (
            ("doc", deltas),
            ("tf", tfs),
            ("dl", dls),
        ):
            buf, sizes = pfor_encode_blocks(stream, bs_arr, be_arr)
            o = np.zeros(n_blocks + 1, dtype=np.uint32)
            np.cumsum(sizes, out=o[1:])
            blobs[name], offsets[name] = buf, o
        for bk, (s, e) in enumerate(zip(block_starts, block_bounds)):
            block_last[bk] = doc_ids[e - 1]
            block_ub[bk] = ub_float32(comp[s:e].max())
        out = {
            "n_postings": n,
            "block_size": block_size,
            "codec": CODEC_PFOR,
            "doc_blob": blobs.get("doc", b""),
            "tf_blob": blobs.get("tf", b""),
            "dl_blob": blobs.get("dl", b""),
            "doc_off": offsets.get("doc", np.zeros(1, dtype=np.uint32)),
            "tf_off": offsets.get("tf", np.zeros(1, dtype=np.uint32)),
            "dl_off": offsets.get("dl", np.zeros(1, dtype=np.uint32)),
            "block_last": block_last,
            "block_ub": block_ub,
        }
        if impact:
            out.update(
                encode_impact(
                    doc_ids, tfs, dls, avg_doc_len, block_size, k1, b
                )
            )
        return out
    for bk, (s, e) in enumerate(zip(block_starts, block_bounds)):
        doc_parts.append(varint_encode(deltas[s:e]))
        tf_parts.append(varint_encode(tfs[s:e]))
        dl_parts.append(varint_encode(dls[s:e]))
        block_last[bk] = doc_ids[e - 1]
        block_ub[bk] = ub_float32(comp[s:e].max())

    def offs(parts: list[bytes]) -> np.ndarray:
        o = np.zeros(len(parts) + 1, dtype=np.uint32)
        np.cumsum([len(p) for p in parts], out=o[1:])
        return o

    out = {
        "n_postings": n,
        "block_size": block_size,
        "doc_blob": b"".join(doc_parts),
        "tf_blob": b"".join(tf_parts),
        "dl_blob": b"".join(dl_parts),
        "doc_off": offs(doc_parts),
        "tf_off": offs(tf_parts),
        "dl_off": offs(dl_parts),
        "block_last": block_last,
        "block_ub": block_ub,
    }
    if impact:
        out.update(
            encode_impact(doc_ids, tfs, dls, avg_doc_len, block_size, k1, b)
        )
    return out


def encode_impact(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avg_doc_len: float,
    block_size: int = POSTING_BLOCK_SIZE,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> dict:
    """Impact-ordered companion encoding of one posting chunk.

    Postings sorted by DESCENDING idf-free BM25 component (ties → docID
    ascending) under the encode-time ``avg_doc_len``, sliced into blocks of
    ``block_size``; docIDs are stored as absolute varints (an impact
    permutation is not monotone, so delta coding buys nothing, and only the
    head blocks are ever read).  ``imp_cmax[i]`` = component of block i's
    first entry rounded UP to float32 — because the order is globally
    descending it upper-bounds every entry in blocks ``>= i``, which is the
    frontier bound the Threshold-Algorithm scorer (``query/impact.py``)
    needs.  Under a drifted global avgdl the query layer rescales by
    ``max(1, avg_now/avg_enc)`` exactly as it does ``block_ub`` (component
    monotone in avgdl, ratio bounded by the avg ratio), so the bound stays
    conservative even though the stored ORDER is then only approximate.
    """
    n = int(doc_ids.size)
    doc_ids = np.ascontiguousarray(doc_ids, dtype=_U64)
    tfs = np.ascontiguousarray(tfs, dtype=_U64)
    dls = np.ascontiguousarray(dls, dtype=_U64)
    comp = bm25_tf_component(tfs, dls, avg_doc_len, k1, b) if n else np.zeros(0)
    order = np.lexsort((doc_ids, -comp))
    doc_i, tf_i, dl_i = doc_ids[order], tfs[order], dls[order]
    n_blocks = (n + block_size - 1) // block_size if n else 0
    starts = np.arange(n_blocks, dtype=np.int64) * block_size
    doc_parts, tf_parts, dl_parts = [], [], []
    for bk in range(n_blocks):
        s, e = int(starts[bk]), min(int(starts[bk]) + block_size, n)
        doc_parts.append(varint_encode(doc_i[s:e]))
        tf_parts.append(varint_encode(tf_i[s:e]))
        dl_parts.append(varint_encode(dl_i[s:e]))
    imp_cmax = (
        ub_float32(np.maximum.reduceat(comp[order], starts))
        if n_blocks
        else np.zeros(0, dtype=np.float32)
    )

    def offs(parts: list[bytes]) -> np.ndarray:
        o = np.zeros(len(parts) + 1, dtype=np.uint32)
        np.cumsum([len(p) for p in parts], out=o[1:])
        return o

    return {
        "imp_doc_blob": b"".join(doc_parts),
        "imp_tf_blob": b"".join(tf_parts),
        "imp_dl_blob": b"".join(dl_parts),
        "imp_doc_off": offs(doc_parts),
        "imp_tf_off": offs(tf_parts),
        "imp_dl_off": offs(dl_parts),
        "imp_cmax": imp_cmax,
    }


def decode_impact_block(
    chunk: dict, block: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one impact-ordered block → (doc_ids, tfs, dls), impact order."""
    do, to, lo = chunk["imp_doc_off"], chunk["imp_tf_off"], chunk["imp_dl_off"]
    docs = varint_decode(memoryview(chunk["imp_doc_blob"])[do[block] : do[block + 1]])
    tfs = varint_decode(memoryview(chunk["imp_tf_blob"])[to[block] : to[block + 1]])
    dls = varint_decode(memoryview(chunk["imp_dl_blob"])[lo[block] : lo[block + 1]])
    return docs, tfs, dls


def impact_n_blocks(chunk: dict) -> int:
    return len(chunk["imp_cmax"])


def _pfor_streams(
    chunk: dict, from_block: int = 0, to_block: int | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc deltas, tfs, dls) of a PFor chunk's block range."""
    n, bs = chunk["n_postings"], chunk["block_size"]
    return (
        pfor_decode_values(
            chunk["doc_blob"], chunk["doc_off"], n, bs, from_block, to_block
        ),
        pfor_decode_values(
            chunk["tf_blob"], chunk["tf_off"], n, bs, from_block, to_block
        ),
        pfor_decode_values(
            chunk["dl_blob"], chunk["dl_off"], n, bs, from_block, to_block
        ),
    )


def decode_chunk(chunk: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full decode of one chunk → (doc_ids, tfs, dls)."""
    n = chunk["n_postings"]
    if n == 0:
        z = np.zeros(0, dtype=_U64)
        return z, z.copy(), z.copy()
    if chunk.get("codec", CODEC_VARINT) == CODEC_PFOR:
        deltas, tfs, dls = _pfor_streams(chunk)
        return np.cumsum(deltas, dtype=_U64), tfs, dls
    deltas = varint_decode(chunk["doc_blob"])
    doc_ids = np.cumsum(deltas, dtype=_U64)
    tfs = varint_decode(chunk["tf_blob"])
    dls = varint_decode(chunk["dl_blob"])
    return doc_ids, tfs, dls


def decode_block(chunk: dict, block: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a single block independently → (doc_ids, tfs, dls)."""
    base = chunk["block_last"][block - 1] if block > 0 else _U64(0)
    if chunk.get("codec", CODEC_VARINT) == CODEC_PFOR:
        deltas, tfs, dls = _pfor_streams(chunk, block, block + 1)
        return np.cumsum(deltas, dtype=_U64) + base, tfs, dls
    do, to, lo = chunk["doc_off"], chunk["tf_off"], chunk["dl_off"]
    deltas = varint_decode(memoryview(chunk["doc_blob"])[do[block] : do[block + 1]])
    doc_ids = np.cumsum(deltas, dtype=_U64) + base
    tfs = varint_decode(memoryview(chunk["tf_blob"])[to[block] : to[block + 1]])
    dls = varint_decode(memoryview(chunk["dl_blob"])[lo[block] : lo[block + 1]])
    return doc_ids, tfs, dls


def decode_tail(
    chunk: dict, from_block: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode blocks ``from_block..end`` in ONE varint pass per blob.

    Valid because each block's first delta chains from the previous block's
    last docID (``encode_runs`` delta-codes the whole run before slicing
    into blocks), so a cumsum over the concatenated tail deltas plus
    ``block_last[from_block-1]`` reproduces the absolute docIDs exactly.
    This is the WAND drain's bulk path: per-block decode of a long tail is
    thousands of small ``varint_decode`` calls; this is a handful.
    """
    base = chunk["block_last"][from_block - 1] if from_block > 0 else _U64(0)
    if chunk.get("codec", CODEC_VARINT) == CODEC_PFOR:
        deltas, tfs, dls = _pfor_streams(chunk, from_block)
        return np.cumsum(deltas, dtype=_U64) + base, tfs, dls
    do, to, lo = chunk["doc_off"], chunk["tf_off"], chunk["dl_off"]
    deltas = varint_decode(memoryview(chunk["doc_blob"])[do[from_block] :])
    doc_ids = np.cumsum(deltas, dtype=_U64) + base
    tfs = varint_decode(memoryview(chunk["tf_blob"])[to[from_block] :])
    dls = varint_decode(memoryview(chunk["dl_blob"])[lo[from_block] :])
    return doc_ids, tfs, dls


def n_blocks(chunk: dict) -> int:
    return len(chunk["block_last"])
