"""In-memory index API: ephemeral build + search + cleanup."""

from __future__ import annotations

from pathlib import Path

from vexor_ray.api import index_in_memory


def test_index_in_memory_roundtrip(ray_session):
    pages = [
        ("a", "alpha beta gamma"),
        ("b", "alpha alpha delta"),
        ("c", "completely different words"),
    ]
    with index_in_memory(pages, text_only=True) as idx:
        assert idx.doc_count == 3
        assert idx.df("alpha") == 2
        hits = idx.search("alpha", k=10)
        assert [d for d, _ in hits] == [1, 0]  # doc 1 has tf=2 → higher score
        tbl = idx.search_hits([{"query_id": 1, "query": "delta", "k": 5}])
        assert tbl.num_rows == 1
        assert tbl.column("url").to_pylist() == ["b"]
        root = idx._root
        assert root is not None and Path(root).exists()
    assert root is not None and not Path(root).exists()  # cleaned up on exit


def test_clear_index_refuses_non_index_dirs(tmp_path):
    from vexor_ray.api import clear_index

    victim = tmp_path / "precious"
    victim.mkdir()
    (victim / "data.txt").write_text("not an index")
    assert clear_index(victim) is False
    assert (victim / "data.txt").exists()  # untouched
    assert clear_index(tmp_path / "missing") is False


def test_clear_index_removes_real_index(ray_session, tmp_path):
    from vexor_ray.api import clear_index, index_in_memory

    idx = index_in_memory([("u1", "hello world"), ("u2", "other text")])
    try:
        d = idx.searcher.index_dir
        assert d.exists()
        assert clear_index(d) is True
        assert not d.exists()
    finally:
        idx.close()
