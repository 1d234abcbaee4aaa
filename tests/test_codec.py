"""Posting codec round-trip + block decode + property tests."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from vexor_ray.index import codec


def test_varint_roundtrip_edges():
    vals = np.array(
        [0, 1, 127, 128, 129, 16383, 16384, 2**32 - 1, 2**63, 2**64 - 1],
        dtype=np.uint64,
    )
    buf = codec.varint_encode(vals)
    out = codec.varint_decode(buf)
    assert np.array_equal(out, vals)
    assert codec.varint_encode(np.array([], dtype=np.uint64)) == b""
    assert codec.varint_decode(b"").size == 0


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=500)
)
def test_varint_roundtrip_property(values):
    vals = np.array(values, dtype=np.uint64)
    assert np.array_equal(codec.varint_decode(codec.varint_encode(vals)), vals)


def _random_postings(n, seed=0):
    rng = np.random.default_rng(seed)
    doc_ids = np.sort(rng.choice(np.arange(n * 7, dtype=np.uint64), n, replace=False))
    tfs = rng.integers(1, 50, size=n).astype(np.uint64)
    dls = rng.integers(1, 5000, size=n).astype(np.uint64)
    return doc_ids, tfs, dls


def test_chunk_roundtrip_and_blocks():
    doc_ids, tfs, dls = _random_postings(1000, seed=3)
    chunk = codec.encode_chunk(doc_ids, tfs, dls, avg_doc_len=300.0, block_size=128)
    d, t, l = codec.decode_chunk(chunk)
    assert np.array_equal(d, doc_ids)
    assert np.array_equal(t, tfs)
    assert np.array_equal(l, dls)
    assert codec.n_blocks(chunk) == 8
    # per-block independent decode must agree with the full decode
    pos = 0
    for bk in range(codec.n_blocks(chunk)):
        bd, bt, bl = codec.decode_block(chunk, bk)
        size = bd.size
        assert np.array_equal(bd, doc_ids[pos : pos + size])
        assert np.array_equal(bt, tfs[pos : pos + size])
        assert np.array_equal(bl, dls[pos : pos + size])
        pos += size
    assert pos == 1000
    # skip pointers
    assert chunk["block_last"][-1] == doc_ids[-1]
    # bulk tail decode from every block boundary == the full-decode suffix
    for fb in range(codec.n_blocks(chunk)):
        start = fb * 128
        td, tt, tl = codec.decode_tail(chunk, fb)
        assert np.array_equal(td, doc_ids[start:])
        assert np.array_equal(tt, tfs[start:])
        assert np.array_equal(tl, dls[start:])


def test_block_ub_is_upper_bound():
    doc_ids, tfs, dls = _random_postings(500, seed=7)
    avgdl = 321.5
    chunk = codec.encode_chunk(doc_ids, tfs, dls, avg_doc_len=avgdl, block_size=64)
    comp = codec.bm25_tf_component(tfs, dls, avgdl)
    pos = 0
    for bk in range(codec.n_blocks(chunk)):
        size = codec.decode_block(chunk, bk)[0].size
        assert chunk["block_ub"][bk] >= comp[pos : pos + size].max() - 1e-6
        pos += size


def test_empty_and_single_chunk():
    z = np.zeros(0, dtype=np.uint64)
    chunk = codec.encode_chunk(z, z, z, avg_doc_len=1.0)
    assert chunk["n_postings"] == 0
    d, t, l = codec.decode_chunk(chunk)
    assert d.size == 0
    one = codec.encode_chunk(
        np.array([42], dtype=np.uint64),
        np.array([3], dtype=np.uint64),
        np.array([9], dtype=np.uint64),
        avg_doc_len=5.0,
    )
    d, t, l = codec.decode_chunk(one)
    assert d.tolist() == [42] and t.tolist() == [3] and l.tolist() == [9]
