"""Query-aware KWIC snippets: pure window math + lineage text fetch."""

from __future__ import annotations

import pyarrow.parquet as pq

from vexor_ray.query.searcher import Searcher
from vexor_ray.query.snippets import fetch_texts, kwic_snippet, search_snippets


def test_kwic_snippet_window_math():
    text = "a" * 100 + " needle " + "b" * 200
    pos, snip = kwic_snippet(text, ["needle"], width=20)
    assert pos == 102  # 1-based strpos semantics
    assert snip == text[81 : 81 + 40]
    assert "needle" in snip
    # match at the very start: window clamps to the text head
    pos, snip = kwic_snippet("needle tail " + "x" * 100, ["needle"], width=30)
    assert pos == 1 and snip.startswith("needle")
    # earliest across terms wins regardless of term order
    t = "xx bbb yy aaa zz"
    assert kwic_snippet(t, ["aaa", "bbb"], width=5)[0] == kwic_snippet(
        t, ["bbb", "aaa"], width=5
    )[0] == 4
    assert kwic_snippet("no match here", ["absent"]) is None


def test_kwic_marking():
    _, snip = kwic_snippet("the Needle is needled", ["needle"], width=50, mark=True)
    assert "«Needle»" in snip and "«needle»d" in snip


def test_fetch_texts_matches_extraction(built_index, pages_1k):
    from vexor_ray.refimpl.textnorm import extract_text
    from vexor_ray.stages.docids import doc_id_base

    out, _ = built_index
    s = Searcher(out)
    files = sorted(pages_1k.glob("part-*.parquet"))
    # pick rows from different files and row groups
    want = [doc_id_base(0, 3), doc_id_base(2, 100), doc_id_base(3, 200)]
    got = fetch_texts(s, want)
    for d in want:
        fi, r = d >> 32, d & 0xFFFFFFFF
        raw = pq.read_table(files[fi], columns=["html"]).column("html")[r].as_py()
        assert got[d] == (extract_text(raw) or ""), d


def test_search_snippets_e2e(built_index):
    out, _ = built_index
    s = Searcher(out)
    hits = search_snippets(s, "needledften", k=5, width=60)
    assert len(hits) == 5
    top = hits[0]
    assert top["position"] > 0
    assert "«needledften»" in top["snippet"].lower()
    # ranking mirrors plain search
    plain = s.search("needledften", k=5)
    assert [h["doc_id"] for h in hits] == [d for d, _ in plain]
