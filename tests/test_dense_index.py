"""Dense search over embeddings stored IN the index (embed_dim build)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from vexor_ray.fixtures.pages import write_pages
from vexor_ray.index.build import BuildConfig, build_index
from vexor_ray.query.searcher import Searcher
from vexor_ray.refimpl.textnorm import extract_text


@pytest.fixture(scope="module")
def dense_idx(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dense")
    pages = write_pages(tmp / "pages", 300, seed=42, rows_per_file=100)
    idx = tmp / "idx"
    build_index(
        pages,
        idx,
        BuildConfig(
            embed_dim=256,
            num_waves=2,
            partitions_per_wave=2,
            shard_group_size=2,
            tokenize_concurrency=2,
            salt_shift=8,
        ),
    )
    return pages, idx


def test_embedding_column_stored(dense_idx):
    pages, idx = dense_idx
    s = Searcher(idx)
    assert "embedding" in s._docs_ds.schema.names
    tbl = s._docs_ds.to_table(columns=["embedding"])
    assert len(tbl.column("embedding")[0]) == 256


def test_dense_self_retrieval(dense_idx):
    pages, idx = dense_idx
    s = Searcher(idx)
    # query with a doc's own text → that doc must be the dense top-1
    f = sorted(pages.glob("part-*.parquet"))[1]
    t = pq.read_table(f, columns=["url", "html"])
    row = 7
    text = extract_text(t["html"][row].as_py())
    url = t["url"][row].as_py()
    doc_id = (1 << 32) | row
    res = s.search_dense(f"{url} {text}", k=5)
    assert res[0][0] == doc_id
    assert res[0][1] > 0.99  # near-identical vector

    # text-only hybrid runs end to end and ranks the same doc first
    fused = s.search_hybrid_text(f"{url} {text}", k=5)
    assert fused[0][0] == doc_id


def test_dense_requires_embed_build(ray_session, tmp_path):
    pages = write_pages(tmp_path / "p", 150, seed=5, rows_per_file=150)
    idx = tmp_path / "idx"
    build_index(pages, idx, BuildConfig(num_waves=1, shard_group_size=2,
                                        tokenize_concurrency=2))
    with pytest.raises(ValueError, match="embed_dim"):
        Searcher(idx).search_dense("anything")
