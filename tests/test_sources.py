"""Raw-directory ingestion → build → search end-to-end (reference workflow)."""

from __future__ import annotations

from pathlib import Path

import pytest


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    from vexor_ray.stages.officetext import make_simple_docx, make_simple_pptx
    from vexor_ray.stages.pdftext import make_simple_pdf

    root = tmp_path_factory.mktemp("rawcorpus")
    (root / "sub").mkdir()
    (root / "a.txt").write_text("alpha bravo needletxt common")
    (root / "b.md").write_text("# heading\nmarkdown needlemd common")
    (root / "sub" / "c.docx").write_bytes(
        make_simple_docx(["docx paragraph needledocx common"])
    )
    (root / "sub" / "d.pdf").write_bytes(
        make_simple_pdf(["pdf line needlepdf common"])
    )
    (root / "sub" / "e.pptx").write_bytes(
        make_simple_pptx([["slide text needlepptx common"]])
    )
    (root / "skip.log").write_text("never ingested")
    (root / "old.bak.txt").write_text("excluded by pattern")
    return root


def test_collect_files_sorted_and_filtered(corpus_dir):
    from vexor_ray.sources import collect_files

    rels = collect_files(corpus_dir, exclude=("*.bak.txt",))
    assert rels == ["a.txt", "b.md", "sub/c.docx", "sub/d.pdf", "sub/e.pptx"]


def test_read_directory_extracts_all_formats(ray_session, corpus_dir):
    from vexor_ray.sources import read_directory

    df = (
        read_directory(corpus_dir, exclude=("*.bak.txt",))
        .to_pandas()
        .set_index("url")["text"]
    )
    assert df["a.txt"] == "alpha bravo needletxt common"
    assert "needlemd" in df["b.md"]
    assert df["sub/c.docx"] == "docx paragraph needledocx common"
    assert "needlepdf" in df["sub/d.pdf"]
    assert "needlepptx" in df["sub/e.pptx"]
    assert "skip.log" not in df.index and "old.bak.txt" not in df.index


def test_ingest_build_search_end_to_end(ray_session, corpus_dir, tmp_path):
    from vexor_ray.index.build import BuildConfig, build_index
    from vexor_ray.query.searcher import Searcher
    from vexor_ray.sources import ingest_directory

    pages = ingest_directory(corpus_dir, tmp_path / "pages", exclude=("*.bak.txt",))
    out = tmp_path / "idx"
    build_index(
        pages, out, BuildConfig(pre_extracted=True, doc_builder="text", num_waves=1)
    )
    s = Searcher(out)
    for needle, url in [
        ("needletxt", "a.txt"),
        ("needledocx", "sub/c.docx"),
        ("needlepdf", "sub/d.pdf"),
        ("needlepptx", "sub/e.pptx"),
    ]:
        hits = s.search_hits(
            [{"query_id": 1, "query": needle, "k": 3}]
        ).to_pandas()
        assert hits["url"].iloc[0] == url, needle
    # a term every doc shares ranks all five
    hits = s.search_hits([{"query_id": 1, "query": "common", "k": 10}]).to_pandas()
    assert len(hits) == 5


def test_mixed_encoding_pages_survive_and_rank(ray_session, tmp_path):
    """Non-UTF-8 pages are decoded by the charset-fallback arm (reference
    content_extract_service.py:726-749) instead of dropped, and the engine
    and the oracle agree byte-for-byte (both call textnorm.decode_text)."""
    import codecs

    from vexor_ray.index.build import BuildConfig, build_index
    from vexor_ray.query.searcher import Searcher
    from vexor_ray.refimpl import build_oracle_index
    from vexor_ray.refimpl import search as oracle_search
    from vexor_ray.refimpl.textnorm import extract_text
    from vexor_ray.sources import ingest_directory

    root = tmp_path / "mixed"
    root.mkdir()
    bodies = {
        "plain.txt": "plain utf8 needleplain shared words".encode(),
        "legacy.txt": "caf\xe9 visit needlelegacy shared words tr\xe8s bien".encode(
            "cp1252"
        ),
        "wide.txt": codecs.BOM_UTF16_LE
        + "utf sixteen needlewide shared words page body".encode("utf-16-le"),
        "sjis.txt": "日本語ページ needlesjis shared words 判定テスト".encode("shift-jis"),
    }
    for name, data in bodies.items():
        (root / name).write_bytes(data)

    pages = ingest_directory(root, tmp_path / "pages")
    out = tmp_path / "idx"
    build_index(
        pages, out, BuildConfig(pre_extracted=True, doc_builder="text", num_waves=1)
    )
    s = Searcher(out)
    hits = s.search_hits([{"query_id": 1, "query": "shared", "k": 10}]).to_pandas()
    assert len(hits) == 4  # every page survived, including the legacy tail
    for needle, url in [
        ("needleplain", "plain.txt"),
        ("needlelegacy", "legacy.txt"),
        ("needlewide", "wide.txt"),
        ("needlesjis", "sjis.txt"),
    ]:
        h = s.search_hits([{"query_id": 1, "query": needle, "k": 3}]).to_pandas()
        assert h["url"].iloc[0] == url, needle

    # rank identity vs the from-scratch oracle over the SAME decoded texts
    names = sorted(bodies)
    assert all(extract_text(bodies[n]) is not None for n in names)
    oracle = build_oracle_index([(n, bodies[n]) for n in names], text_only=True)
    exp = oracle_search(oracle, "shared words", 10)
    got = s.search_hits([{"query_id": 1, "query": "shared words", "k": 10}]).to_pandas()
    assert [names[d] for d, _ in exp] == got["url"].tolist()
