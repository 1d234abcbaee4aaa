"""HTML extraction / link graph (stages/html.py, pipelines/web.py,
functions/graph.py::pagerank_edges).

Three layers: pure-function spec cases; engine↔DuckDB parity over an
ADVERSARIAL documents table (markup-looking text, double-escaped entities,
CRLF — nastier than the driver corpus); and bit-parity of the
variable-out-degree PageRank against a dense integer reference.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vexor_ray.stages.html import (
    canonicalize_href,
    extract_hrefs,
    html_to_text,
)

BASE = "https://corpus.example/d/1"


class TestHtmlToText:
    def test_script_style_comment_tags(self):
        h = (
            '<html><head><STYLE a="b">p{x}</style><script>if(1<2){}</SCRIPT>'
            "</head><body><p>hello</p><!-- note\nmore --><b>world</b></body>"
        )
        assert html_to_text(h) == "hello world"

    def test_entities_and_double_escape(self):
        assert html_to_text("a &lt;b&gt; &quot;c&#39;&nbsp;d &amp; e") == (
            'a <b> "c\' d & e'
        )
        # &amp; decoded LAST: double-escaped stays single-decoded
        assert html_to_text("&amp;lt;") == "&lt;"

    def test_whitespace_collapse_and_strip(self):
        assert html_to_text("  a\r\n\t b \f\v ") == "a b"

    def test_unterminated_script_falls_to_tag_strip(self):
        # no closing </script>: block regex can't match, the opening tag is
        # stripped as a plain tag and the js text survives as content —
        # deterministic on both engines (documented in the spec)
        assert html_to_text("<script>var x = 1;") == "var x = 1;"

    def test_unterminated_tag_swallows_to_next_gt(self):
        assert html_to_text("a <b attr='x' c>d</b> e") == "a d e"


class TestCanonicalize:
    def test_fragment_and_case(self):
        assert (
            canonicalize_href(BASE, "HTTPS://HOST.Example/Path/X#frag")
            == "https://host.example/Path/X"
        )

    def test_root_relative(self):
        assert canonicalize_href(BASE, "/d/7#a") == "https://corpus.example/d/7"

    def test_dropped_forms(self):
        assert canonicalize_href(BASE, "mailto:x@y.z") is None
        assert canonicalize_href(BASE, "//cdn.example/x") is None
        assert canonicalize_href(BASE, "relative/path") is None
        assert canonicalize_href(BASE, "#top") is None

    def test_order_and_filtering(self):
        h = (
            '<a href="mailto:x">m</a><A Href="/a">r</a>'
            '<a data-q="z" href="http://H.io/B#c">abs</a>'
        )
        assert extract_hrefs(BASE, h) == [
            "https://corpus.example/a",
            "http://h.io/B",
        ]


ADVERSARIAL_TEXTS = [
    "plain words only",
    "a < b & c > d",  # raw angle brackets inside text
    "&amp;lt; double escaped &quot;x&quot;",
    "tabs\tand\r\nnewlines\fhere",
    "looks like <b>markup</b> inside text",
    "trailing space ",
    "",
]


@pytest.fixture(scope="module")
def adv_docs(tmp_path_factory):
    d = tmp_path_factory.mktemp("advdocs")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(ADVERSARIAL_TEXTS)), type=pa.int64()),
            "text": pa.array(ADVERSARIAL_TEXTS, type=pa.string()),
            "lang": pa.array(["en"] * len(ADVERSARIAL_TEXTS)),
            "source": pa.array(["s0"] * len(ADVERSARIAL_TEXTS)),
            "n_chars": pa.array(
                [len(t) for t in ADVERSARIAL_TEXTS], type=pa.int64()
            ),
        }
    )
    pq.write_table(tbl, d / "documents.parquet")
    return d


def _duck(sf_dir, sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con.execute(sql).fetch_arrow_table()


class TestSqlParity:
    def test_html_text_twin(self, ray_session, adv_docs):
        from vexor_ray.pipelines.web import html_text_sql, html_text_table

        eng = (
            html_text_table(str(adv_docs)).to_pandas().sort_values("doc_id")
        )
        ora = _duck(adv_docs, html_text_sql()).to_pandas()
        assert list(eng["text"]) == list(ora["text"])

    def test_extract_links_twin(self, ray_session, adv_docs):
        from vexor_ray.pipelines.web import (
            extract_links_sql,
            extract_links_table,
        )

        eng = (
            extract_links_table(str(adv_docs))
            .to_pandas()
            .sort_values(["doc_id", "link_pos"])
            .reset_index(drop=True)
        )
        ora = _duck(adv_docs, extract_links_sql()).to_pandas()
        assert eng["href"].tolist() == ora["href"].tolist()
        assert eng["doc_id"].tolist() == ora["doc_id"].tolist()

    def test_pagerank_links_twin(self, ray_session, adv_docs):
        from vexor_ray.pipelines.web import (
            pagerank_links_sql,
            pagerank_links_topk,
        )

        eng = pagerank_links_topk(str(adv_docs), k=10, iters=3).to_pandas()
        ora = _duck(adv_docs, pagerank_links_sql(iters=3, k=10)).to_pandas()
        assert eng["doc_id"].tolist() == ora["doc_id"].tolist()
        assert eng["rank"].tolist() == ora["rank"].tolist()


def _dense_pr(n: int, edges: list[tuple[int, int]], iters: int) -> np.ndarray:
    """Single-machine fixed-point reference, same integer ops."""
    from vexor_ray.functions.graph import DAMP_DEN, DAMP_NUM, SCALE

    out = np.zeros(n, dtype=np.int64)
    for s, _ in edges:
        out[s] += 1
    teleport = (DAMP_DEN - DAMP_NUM) * SCALE // (DAMP_DEN * n)
    r = np.full(n, SCALE // n, dtype=np.int64)
    for _ in range(iters):
        acc = np.zeros(n, dtype=np.int64)
        for s, d in edges:
            acc[d] += r[s] // out[s]
        r = teleport + (DAMP_NUM * acc) // DAMP_DEN
    return r


class TestPagerankEdges:
    def test_variable_outdeg_bit_parity(self, ray_session):
        import ray

        from vexor_ray.functions.graph import pagerank_edges

        n = 50
        edges: list[tuple[int, int]] = []
        for i in range(0, n, 2):
            edges.append((i, (i * 3 + 1) % n))
        edges.append((4, 13))  # parallel to 4→13 → double mass
        edges.append((4, 13))
        edges += [(7, 8), (7, 9), (7, 10)]  # outdeg 4 incl. the loop edge
        # odd nodes (except 7) dangle: mass shed, teleport keeps them alive

        docs = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(range(n), type=pa.int64())})
        )
        eds = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([s for s, _ in edges], type=pa.int64()),
                    "dst": pa.array([d for _, d in edges], type=pa.int64()),
                }
            )
        )
        got = (
            pagerank_edges(docs, eds, iters=4, n_parts=8)
            .to_pandas()
            .sort_values("doc_id")
        )
        want = _dense_pr(n, edges, iters=4)
        assert got["doc_id"].tolist() == list(range(n))
        assert got["rank"].tolist() == want.tolist()

    def test_resolve_links_inner_join(self, ray_session):
        import ray

        from vexor_ray.stages.html import resolve_links

        links = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 0, 1, 2], type=pa.int64()),
                    "href": pa.array(
                        ["u/a", "u/a", "u/dead", "u/b"], type=pa.string()
                    ),
                }
            )
        )
        mapping = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([10, 11], type=pa.int64()),
                    "url": pa.array(["u/a", "u/b"], type=pa.string()),
                }
            )
        )
        got = (
            resolve_links(links, mapping, n_parts=4)
            .to_pandas()
            .sort_values(["src", "dst"])
            .reset_index(drop=True)
        )
        # duplicate href → two edges; dead link dropped
        assert list(zip(got["src"], got["dst"])) == [
            (0, 10),
            (0, 10),
            (2, 11),
        ]


class TestAnchors:
    def test_anchor_pairs_and_unclosed(self):
        from vexor_ray.stages.html import extract_anchors

        h = (
            '<a href="/a">first</a>'
            '<a href="mailto:x">drop</a>'
            '<A HREF="HTTP://H.io/B#f" class="x">Bold <b>text</b></A>'
            '<a href="/unclosed">never closes'
        )
        got = extract_anchors(BASE, h)
        # unclosed element yields no pair; inner markup kept raw
        assert got == [
            ("https://corpus.example/a", "first"),
            ("http://h.io/B", "Bold <b>text</b>"),
        ]

    def test_anchor_multiline(self):
        from vexor_ray.stages.html import extract_anchors

        h = '<a href="/x">line one\nline two</a>'
        assert extract_anchors(BASE, h) == [
            ("https://corpus.example/x", "line one\nline two")
        ]
