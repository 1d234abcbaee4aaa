"""PForDelta posting codec (index/codec.py::pfor_*, BuildConfig.posting_codec).

Contract: a pfor index is bit-identical to a varint index in every query
result — the codec changes only the bytes of the three posting streams.
Measured tradeoff (BASELINE.md): 25-75% smaller streams on dense blocks,
~0.92x aggregate at small Zipfian corpora (tiny tail chunks carry 2-byte
headers), ~1.25x build wall — hence opt-in.
"""

from __future__ import annotations

import numpy as np
import pytest

from vexor_ray.fixtures.pages import generate_queries, write_pages
from vexor_ray.index import codec
from vexor_ray.index.build import BuildConfig, build_index
from vexor_ray.query.searcher import Searcher


def _cfg(**kw):
    base = dict(
        num_waves=2,
        partitions_per_wave=2,
        shard_group_size=1,
        tokenize_concurrency=2,
        salt_shift=8,
        shuffle_backend="hash",
        posting_codec="pfor",
    )
    base.update(kw)
    return BuildConfig(**base)


# ---------------------------------------------------------------- kernels


def _random_stream(rng, kind: int, n: int) -> np.ndarray:
    if kind == 0:
        return rng.integers(0, 16, n).astype(np.uint64)
    if kind == 1:
        return rng.integers(0, 2**40, n).astype(np.uint64)
    if kind == 2:
        return np.zeros(n, dtype=np.uint64)
    if kind == 3:
        v = rng.integers(0, 4, n).astype(np.uint64)
        idx = rng.integers(0, n, max(1, n // 50))
        v[idx] = rng.integers(0, 2**63, idx.size).astype(np.uint64)
        return v
    return (rng.integers(0, 2**63, n).astype(np.uint64) << np.uint64(1)) | np.uint64(1)


def test_pfor_roundtrip_property():
    rng = np.random.default_rng(11)
    for trial in range(120):
        n = int(rng.integers(1, 3000))
        bs = int(rng.choice([128, 64, 16, 7, 256]))
        v = _random_stream(rng, trial % 5, n)
        K = (n + bs - 1) // bs
        starts = np.arange(K) * bs
        ends = np.minimum(starts + bs, n)
        buf, sizes = codec.pfor_encode_blocks(v, starts, ends)
        offs = np.zeros(K + 1, dtype=np.int64)
        np.cumsum(sizes, out=offs[1:])
        assert np.array_equal(codec.pfor_decode_values(buf, offs, n, bs), v)
        f = int(rng.integers(0, K))
        t = int(rng.integers(f + 1, K + 1))
        assert np.array_equal(
            codec.pfor_decode_values(buf, offs, n, bs, f, t),
            v[starts[f] : ends[t - 1]],
        )


def test_pfor_exception_budget_and_size():
    """Width is the exact order statistic: ≤ m//8 exceptions per block, and
    dense small-value streams compress well below varint."""
    rng = np.random.default_rng(3)
    v = rng.integers(1, 4, 12800).astype(np.uint64)  # tf-like
    K = 100
    starts = np.arange(K) * 128
    ends = starts + 128
    buf, sizes = codec.pfor_encode_blocks(v, starts, ends)
    assert len(buf) < 0.45 * len(codec.varint_encode(v))
    arr = np.frombuffer(buf, dtype=np.uint8)
    offs = np.zeros(K + 1, dtype=np.int64)
    np.cumsum(sizes, out=offs[1:])
    n_exc = arr[offs[:-1] + 1]
    assert (n_exc <= 128 // 8).all()


def test_encode_chunk_pfor_equals_varint_decode():
    rng = np.random.default_rng(5)
    n = 1000
    doc_ids = np.cumsum(rng.integers(1, 50, n)).astype(np.uint64)
    tfs = rng.integers(1, 9, n).astype(np.uint64)
    dls = rng.integers(50, 900, n).astype(np.uint64)
    a = codec.encode_chunk(doc_ids, tfs, dls, 300.0)
    p = codec.encode_chunk(doc_ids, tfs, dls, 300.0, codec="pfor")
    assert p["codec"] == codec.CODEC_PFOR
    assert np.array_equal(p["block_last"], a["block_last"])
    assert np.array_equal(p["block_ub"], a["block_ub"])
    for fn in (codec.decode_chunk,):
        for x, y in zip(fn(a), fn(p)):
            assert np.array_equal(x, y)
    nb = codec.n_blocks(a)
    for blk in range(nb):
        for x, y in zip(codec.decode_block(a, blk), codec.decode_block(p, blk)):
            assert np.array_equal(x, y)
    for fb in (0, 1, nb // 2, nb - 1):
        for x, y in zip(codec.decode_tail(a, fb), codec.decode_tail(p, fb)):
            assert np.array_equal(x, y)


# ------------------------------------------------------------------- e2e


N_PAGES = 300


@pytest.fixture(scope="module")
def pfor_setup(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pfor")
    pages = write_pages(tmp / "pages", N_PAGES, seed=42, rows_per_file=100)
    iv = tmp / "idx_varint"
    ip = tmp / "idx_pfor"
    build_index(pages, iv, _cfg(posting_codec="varint"))
    build_index(pages, ip, _cfg())
    return {"tmp": tmp, "pages": pages, "iv": iv, "ip": ip}


def test_pfor_index_rank_identical(pfor_setup):
    s1 = Searcher(pfor_setup["iv"])
    s2 = Searcher(pfor_setup["ip"])
    assert s2._codec == "pfor"
    for q in [r["query"] for r in generate_queries(60, seed=9)]:
        for m in ("exact", "wand", "auto"):
            assert s1.search(q, k=50, method=m) == s2.search(q, k=50, method=m), (q, m)


def test_pfor_sharded_scorer_parity(pfor_setup):
    s1 = Searcher(pfor_setup["iv"])
    s2 = Searcher(pfor_setup["ip"], max_dense_docs=64)
    assert s2._sharded
    for q in [r["query"] for r in generate_queries(20, seed=9)]:
        assert s1.search(q, k=100, method="exact") == s2.search(
            q, k=100, method="exact"
        ), q


def test_pfor_with_impact_layout(pfor_setup, tmp_path):
    """Impact companion streams stay varint; the TA scorer's random access
    decodes the DOC-ordered layout through the pfor dispatch."""
    idx = tmp_path / "idx_pfor_imp"
    build_index(pfor_setup["pages"], idx, _cfg(impact_postings=True))
    s1 = Searcher(pfor_setup["iv"])
    s2 = Searcher(idx)
    for q in [r["query"] for r in generate_queries(30, seed=9)]:
        got = s2.search(q, k=20, method="impact")
        want = s1.search(q, k=20, method="exact")
        assert got == want, q


def test_pfor_incremental_and_compaction(pfor_setup, tmp_path):
    """Delta generations and compaction re-encode under the same codec and
    stay bit-equal to a fresh build over the grown corpus."""
    import shutil

    from vexor_ray.index.build import compact_index

    src = tmp_path / "pages_grow"
    shutil.copytree(pfor_setup["pages"], src)
    idx = tmp_path / "idx_inc"
    build_index(src, idx, _cfg())
    write_pages(tmp_path / "extra", 300, seed=77, rows_per_file=300)
    shutil.copy(
        sorted((tmp_path / "extra").glob("*.parquet"))[0],
        src / "part-extra.parquet",
    )
    build_index(src, idx, _cfg())  # incremental generation

    fresh = tmp_path / "idx_fresh"
    build_index(src, fresh, _cfg())
    s1, s2 = Searcher(fresh), Searcher(idx)
    qs = [r["query"] for r in generate_queries(30, seed=9)]
    for q in qs:
        assert s1.search(q, k=30) == s2.search(q, k=30), q

    compact_index(src, idx, _cfg())
    s3 = Searcher(idx)
    for q in qs:
        assert s1.search(q, k=30) == s3.search(q, k=30), ("compacted", q)
