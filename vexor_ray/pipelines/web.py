"""Webtext pipelines over the driver's ``documents`` table.

The driver corpus carries plain ``text`` — no markup, no hyperlinks — so
this module *renders* a deterministic Common-Crawl-style HTML page per
document (title/style/script/comment boilerplate, entity escapes, and a
doc_id-derived set of ``<a href>`` links in absolute / root-relative /
uppercase-host / fragment forms) and then runs the REAL web extraction
stack over it:

- :func:`html_text_table` — ``stages/html.py::html_to_text`` markup
  stripping (driver query ``html_text``)
- :func:`extract_links_table` — href extraction + url canonicalization
  (driver query ``extract_links``)
- :func:`pagerank_links_topk` — href extraction → url→doc_id hash join →
  :func:`vexor_ray.functions.graph.pagerank_edges` over the REAL extracted
  edge list with variable out-degree (driver query ``pagerank_links``)

The render step is the value-checkability device: both the Ray engine and
the DuckDB twin construct byte-identical HTML from the same table (string
concatenation of doc_id/text), so every downstream extraction rule is
hash-checked end to end.  On a real crawl the render stage is simply
deleted — the extraction stages consume the crawl's ``html`` column
directly and nothing downstream changes.

The SQL twin builders live here too (interpolating the very pattern
constants the engine compiles), so there is one spec, not two dialects.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..stages.html import (
    COMMENT_RE,
    ENTITIES,
    HREF_RE,
    ORIGIN_RE,
    SCRIPT_RE,
    STYLE_RE,
    TAG_RE,
    WS_RE,
    extract_links_stage,
    html_text_stage,
    resolve_links,
)


def _render_links(d: int, n: int) -> str:
    out = []
    for j in range(d % 4):
        dst = (d * 131 + 17 * j + 7) % n
        if j == 0:
            out.append(
                f'<A HREF="HTTPS://CORPUS.example/d/{dst}#top">see d{dst} guide</A>'
            )
        elif j == 1:
            out.append(f'<a href="/d/{dst}">read d{dst}</a>')
        else:
            out.append(
                f'<a rel="nofollow" href="https://corpus.example/d/{dst}">more about d{dst}</a>'
            )
    return "".join(out)


def render_page(d: int, text: str, n: int) -> tuple[str, str]:
    """(url, html) for one document — MUST stay byte-identical to the SQL
    construction in :func:`_html_ctes`."""
    url = f"https://corpus.example/d/{d}"
    html = (
        f"<html><head><title>T {d}</title>"
        f'<style type="text/css">p {{color:red}}</style>'
        f'<script src="/j.js">var i = 1 < 2;</script></head>'
        f'<body><h1>Doc {d}</h1><p id="b">{text}</p><!-- c -->'
        f"{_render_links(d, n)}"
        f'<a href="mailto:x@y.z">m</a><a href="//cdn.example/x">p</a>'
        f" &amp;amp; 1 &lt; 2&nbsp;&#39;&quot;</body></html>"
    )
    return url, html


def rendered_pages(sf_dir: str) -> ray.data.Dataset:
    """documents → (doc_id, url, html) — the deterministic synthetic crawl."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n = ds.count()

    def render(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        urls, htmls = [], []
        for d, t in zip(ids, texts):
            u, h = render_page(int(d), t, n)
            urls.append(u)
            htmls.append(h)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "url": pa.array(urls, type=pa.string()),
                "html": pa.array(htmls, type=pa.string()),
            }
        )

    return ds.map_batches(render, batch_format="pyarrow", zero_copy_batch=True)


def html_text_table(sf_dir: str) -> ray.data.Dataset:
    """Driver query ``html_text``: (doc_id, text) — markup stripped by the
    spec in ``stages/html.py``."""
    return html_text_stage(rendered_pages(sf_dir))


def extract_links_table(sf_dir: str) -> ray.data.Dataset:
    """Driver query ``extract_links``: (doc_id, link_pos, href) —
    canonicalized kept links in document order."""
    return extract_links_stage(rendered_pages(sf_dir))


def link_edges(sf_dir: str) -> ray.data.Dataset:
    """Extracted + resolved link graph: (src, dst) int64 edges."""
    pages = rendered_pages(sf_dir)
    links = extract_links_stage(pages)
    mapping = pages.map_batches(
        lambda b: b.select(["doc_id", "url"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return resolve_links(links, mapping)


def pagerank_links_topk(sf_dir: str, k: int = 100, iters: int = 5) -> pa.Table:
    """Driver query ``pagerank_links``: top-k PageRank over the EXTRACTED
    link graph (variable out-degree; edges materialized once)."""
    from ..functions.graph import _ranks_topk, pagerank_edges
    from ..functions.groups import compact_blocks

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    # href extraction inherits the wide html input's block count; compact
    # the (narrow) edge list so iterations don't union dozens of near-empty
    # blocks per pass
    edges = compact_blocks(link_edges(sf_dir).materialize())
    return _ranks_topk(pagerank_edges(docs, edges, iters=iters), k)


# ---------------------------------------------------------------------------
# SQL twins (DuckDB) — interpolate the SAME pattern constants the engine
# compiles; documents is the pre-registered view.
# ---------------------------------------------------------------------------


def _sql_quote(pat: str) -> str:
    """Escape a regex constant for embedding in a single-quoted SQL string
    (E-string escapes are not used; only single quotes need doubling)."""
    return pat.replace("'", "''")


def _html_ctes() -> str:
    """CTE body producing ``hpages(doc_id, url, html)`` — byte-identical to
    :func:`render_page` (twin of :func:`rendered_pages`)."""
    dst = lambda off: (  # noqa: E731
        f"CAST((d.doc_id*131 + {off}) % (SELECT c FROM hn) AS VARCHAR)"
    )
    return f"""hn AS (SELECT COUNT(*) AS c FROM documents),
hl AS (SELECT d.doc_id, COALESCE(string_agg(CASE
   WHEN js.j = 0 THEN '<A HREF="HTTPS://CORPUS.example/d/' || {dst(7)} || '#top">see d' || {dst(7)} || ' guide</A>'
   WHEN js.j = 1 THEN '<a href="/d/' || {dst(24)} || '">read d' || {dst(24)} || '</a>'
   WHEN js.j = 2 THEN '<a rel="nofollow" href="https://corpus.example/d/' || {dst(41)} || '">more about d' || {dst(41)} || '</a>'
  END, '' ORDER BY js.j), '') AS links
  FROM documents d LEFT JOIN (SELECT UNNEST(range(3)) AS j) js
    ON js.j < d.doc_id % 4
  GROUP BY d.doc_id),
hpages AS (SELECT d.doc_id,
  'https://corpus.example/d/' || CAST(d.doc_id AS VARCHAR) AS url,
  '<html><head><title>T ' || CAST(d.doc_id AS VARCHAR)
  || '</title><style type="text/css">p {{color:red}}</style><script src="/j.js">var i = 1 < 2;</script></head><body><h1>Doc '
  || CAST(d.doc_id AS VARCHAR) || '</h1><p id="b">' || d.text
  || '</p><!-- c -->' || hl.links
  || '<a href="mailto:x@y.z">m</a><a href="//cdn.example/x">p</a> &amp;amp; 1 &lt; 2&nbsp;&#39;&quot;</body></html>'
  AS html
  FROM documents d JOIN hl USING (doc_id))"""


def _entity_chain(expr: str) -> str:
    for ent, rep in ENTITIES:
        expr = f"replace({expr}, '{_sql_quote(ent)}', '{_sql_quote(rep)}')"
    return expr


def html_text_sql() -> str:
    strip_set = "' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)"
    x = "html"
    for pat in (SCRIPT_RE, STYLE_RE, COMMENT_RE, TAG_RE):
        x = f"regexp_replace({x}, '{_sql_quote(pat)}', ' ', 'g')"
    x = _entity_chain(x)
    x = f"trim(regexp_replace({x}, '{_sql_quote(WS_RE)}', ' ', 'g'), {strip_set})"
    return (
        "WITH "
        + _html_ctes()
        + f"\nSELECT doc_id, {x} AS text FROM hpages ORDER BY doc_id"
    )


def _canon_lambda() -> str:
    """DuckDB lambda body canonicalizing one raw href ``h`` (NULL = drop) —
    rule-for-rule twin of ``stages/html.py::canonicalize_href``."""
    origin = _sql_quote(ORIGIN_RE)
    return f"""h -> CASE
   WHEN split_part(h, '#', 1) = '' THEN NULL
   WHEN lower(split_part(h, '#', 1)) LIKE 'http://%'
     OR lower(split_part(h, '#', 1)) LIKE 'https://%'
     THEN lower(regexp_extract(split_part(h, '#', 1), '{origin}', 1))
          || regexp_extract(split_part(h, '#', 1), '{origin}', 2)
   WHEN split_part(h, '#', 1) LIKE '//%' THEN NULL
   WHEN split_part(h, '#', 1) LIKE '/%'
     THEN lower(regexp_extract(url, '{origin}', 1)) || split_part(h, '#', 1)
   ELSE NULL END"""


def _links_cte() -> str:
    """CTE body (appended after ``_html_ctes``) producing
    ``hrefs(doc_id, link_pos, href)``."""
    href_pat = _sql_quote(HREF_RE)
    return f""",
hlists AS (SELECT doc_id, url,
  list_filter(list_transform(
    regexp_extract_all(html, '{href_pat}', 1), {_canon_lambda()}),
    x -> x IS NOT NULL) AS hs
  FROM hpages),
hrefs AS (SELECT doc_id,
  CAST(generate_subscripts(hs, 1) - 1 AS INT) AS link_pos,
  UNNEST(hs) AS href FROM hlists)"""


def extract_links_sql() -> str:
    return (
        "WITH "
        + _html_ctes()
        + _links_cte()
        + "\nSELECT doc_id, link_pos, href FROM hrefs"
        + " ORDER BY doc_id, link_pos"
    )


def pagerank_links_sql(iters: int = 5, k: int = 100) -> str:
    """Unrolled fixed-point iteration twin of :func:`pagerank_links_topk`
    — variable out-degree, inner-join edge resolution, integer grid."""
    from ..functions.graph import SCALE

    parts = [
        "WITH ",
        _html_ctes(),
        _links_cte(),
        """,
ledges AS (SELECT h.doc_id AS src, m.doc_id AS dst
  FROM hrefs h JOIN hpages m ON h.href = m.url),
lout AS (SELECT src, COUNT(*) AS od FROM ledges GROUP BY src),
r0 AS (SELECT doc_id,""",
        f" CAST({SCALE} // (SELECT c FROM hn) AS BIGINT) AS rank"
        " FROM documents)",
    ]
    for i in range(iters):
        parts.append(
            f", r{i + 1} AS (SELECT d.doc_id,"
            f" CAST({3 * SCALE} // (20 * (SELECT c FROM hn))"
            f" + (17 * COALESCE(s.s, 0)) // 20 AS BIGINT) AS rank"
            f" FROM documents d LEFT JOIN ("
            f"SELECT e.dst AS doc_id, SUM(r{i}.rank // o.od) AS s"
            f" FROM ledges e JOIN r{i} ON e.src = r{i}.doc_id"
            f" JOIN lout o ON o.src = e.src GROUP BY e.dst"
            f") s ON d.doc_id = s.doc_id)"
        )
    parts.append(
        f" SELECT doc_id, rank FROM r{iters}"
        f" ORDER BY rank DESC, doc_id LIMIT {k}"
    )
    return "".join(parts)


def warc_roundtrip_table(sf_dir: str) -> ray.data.Dataset:
    """Driver query ``warc_roundtrip``: documents → WARC.gz shards (one
    gzip member per record, ``vexor_ray/warc.py``) → parse back → (doc_id,
    text).  The identity SQL twin makes the hash check a proof that the
    from-scratch writer+parser round-trips bytes exactly."""
    import hashlib as _hashlib

    from ..hashing import file_fingerprint
    from ..warc import read_warc, write_warc_dataset

    src = f"{sf_dir}/documents.parquet"
    docs = ray.data.read_parquet(src, columns=["doc_id", "text"])

    def to_pages(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table(
            {
                "url": pa.array(
                    [f"https://corpus.example/d/{d}" for d in ids],
                    type=pa.string(),
                ),
                "html": pa.array(
                    [t.encode("utf-8") for t in batch.column("text").to_pylist()],
                    type=pa.binary(),
                ),
            }
        )

    pages = docs.map_batches(
        to_pages, batch_format="pyarrow", zero_copy_batch=True
    )
    key = _hashlib.sha1(file_fingerprint([src]).encode()).hexdigest()[:16]
    out = f"/tmp/vexor_ray_cache/warc_{key}"
    files = write_warc_dataset(pages, out, ts_col=None, payload_col="html")
    back = read_warc(files)

    def to_rows(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(
                    [int(u.rsplit("/", 1)[-1]) for u in urls], type=pa.int64()
                ),
                "text": pa.array(
                    [p.decode("utf-8") for p in batch.column("html").to_pylist()],
                    type=pa.string(),
                ),
            }
        )

    return back.map_batches(to_rows, batch_format="pyarrow", zero_copy_batch=True)


def warc_documents_index(sf_dir: str):
    """Index whose corpus ARRIVED through the WARC source path:
    documents → .warc.gz shards → read_warc → pages shards → build_index.

    Same build config and url contract (url = zero-padded original id) as
    ``pipelines/corpus.py::documents_index``, so the resulting index must
    be rank-identical to the parquet-sourced one — ``bm25_from_warc``
    hash-checks exactly that against the shared BM25 twin.
    """
    import hashlib as _hashlib

    from ..hashing import file_fingerprint
    from ..index.build import BuildConfig, build_index
    from ..index.manifest import MANIFEST_NAME
    from ..spec import INDEX_FORMAT_VERSION
    from ..warc import read_warc, write_warc_dataset
    from .corpus import _CACHE_ROOT, write_pages_shards

    src = f"{sf_dir}/documents.parquet"
    fp = file_fingerprint([src])
    key = _hashlib.sha1(
        f"warcidx|{fp}|v{INDEX_FORMAT_VERSION}".encode()
    ).hexdigest()[:16]
    idx_dir = _CACHE_ROOT / f"warc_index_{key}"
    if not (idx_dir / MANIFEST_NAME).exists():
        docs = ray.data.read_parquet(src, columns=["doc_id", "text"])

        def to_warc_pages(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            return pa.table(
                {
                    "url": pa.array(
                        [f"{d:020d}" for d in ids], type=pa.string()
                    ),
                    "html": pa.array(
                        [
                            t.encode("utf-8")
                            for t in batch.column("text").to_pylist()
                        ],
                        type=pa.binary(),
                    ),
                }
            )

        warc_dir = idx_dir.parent / (idx_dir.name + "_warc")
        files = write_warc_dataset(
            docs.map_batches(
                to_warc_pages, batch_format="pyarrow", zero_copy_batch=True
            ),
            warc_dir,
            ts_col=None,
            payload_col="html",
        )

        def to_pages(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table(
                {
                    "url": batch.column("url"),
                    "text": pc.cast(
                        pc.cast(batch.column("html"), pa.string()),
                        pa.large_string(),
                    ),
                }
            )

        pages = read_warc(files).map_batches(
            to_pages, batch_format="pyarrow", zero_copy_batch=True
        )
        shards = write_pages_shards(
            pages, idx_dir.parent / (idx_dir.name + "_pages")
        )
        cfg = BuildConfig(
            pre_extracted=True,
            text_only=True,
            num_waves=1,
            partitions_per_wave=4,
            shard_group_size=8,
            tokenize_concurrency=2,
        )
        build_index(shards, idx_dir, cfg)
    return idx_dir


def bm25_from_warc_table(sf_dir: str, query: str) -> pa.Table:
    """Driver query ``bm25_from_warc``: exact BM25 scores from the
    WARC-sourced index — same twin as ``bm25_scores`` (source-path
    independence of the ranking)."""
    from .corpus import DocumentsSearcher, bm25_scores_table  # noqa: F401

    s = DocumentsSearcher(sf_dir, index_dir=warc_documents_index(sf_dir))
    pairs = s.scores(query)
    pairs.sort(key=lambda p: p[0])
    return pa.table(
        {
            "doc_id": pa.array([p[0] for p in pairs], type=pa.int64()),
            "score": pa.array(
                [round(p[1], 6) for p in pairs], type=pa.float64()
            ),
        }
    )


def _messy_url(d: int, source: str) -> str:
    """Deterministic un-normalized url per document — byte-identical to the
    SQL construction in :func:`url_normalize_sql` (case-shifted hosts,
    default ports, tracker params, unsorted queries, fragments)."""
    c = d % 4
    if c == 0:
        return f"HTTP://{source.upper()}.Example:80/a/{d}?utm_source=x&b=2&a=1#frag"
    if c == 1:
        return f"https://{source}.example:443/b/{d}?z=1&y=2&y=1"
    if c == 2:
        return f"http://{source}.EXAMPLE/c/{d}#x"
    return f"https://{source}.example?utm_a=1&utm_b=2"


def url_normalize_table(sf_dir: str) -> ray.data.Dataset:
    """Driver query ``url_normalize``: (doc_id, url, url_norm) — the
    crawl-dedup canonicalizer (functions/urls.py) over deterministically
    constructed messy urls."""
    from ..functions.urls import normalize_urls_stage

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def render(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        srcs = batch.column("source").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "url": pa.array(
                    [_messy_url(int(d), s) for d, s in zip(ids, srcs)],
                    type=pa.string(),
                ),
            }
        )

    return normalize_urls_stage(
        ds.map_batches(render, batch_format="pyarrow", zero_copy_batch=True)
    )


def url_normalize_sql() -> str:
    from ..functions.urls import URL_RE

    pat = _sql_quote(URL_RE)
    return f"""
WITH m AS (SELECT doc_id, CASE doc_id % 4
  WHEN 0 THEN 'HTTP://' || upper(source) || '.Example:80/a/' || CAST(doc_id AS VARCHAR) || '?utm_source=x&b=2&a=1#frag'
  WHEN 1 THEN 'https://' || source || '.example:443/b/' || CAST(doc_id AS VARCHAR) || '?z=1&y=2&y=1'
  WHEN 2 THEN 'http://' || source || '.EXAMPLE/c/' || CAST(doc_id AS VARCHAR) || '#x'
  ELSE 'https://' || source || '.example?utm_a=1&utm_b=2' END AS url
 FROM documents),
n AS (SELECT doc_id, url, split_part(url, '#', 1) AS h FROM m),
p AS (SELECT doc_id, url, h,
  regexp_matches(h, '{pat}') AS ok,
  lower(regexp_extract(h, '{pat}', 1)) AS sch,
  lower(regexp_extract(h, '{pat}', 2)) AS auth,
  regexp_extract(h, '{pat}', 3) AS pth,
  list_sort(list_filter(str_split(regexp_extract(h, '{pat}', 4), '&'),
    x -> x <> '' AND NOT starts_with(x, 'utm_'))) AS plist
 FROM n)
SELECT doc_id, url,
 CASE WHEN NOT ok THEN h ELSE
  sch || '://' ||
  CASE WHEN sch = 'http' AND auth LIKE '%:80'
         THEN substr(auth, 1, length(auth) - 3)
       WHEN sch = 'https' AND auth LIKE '%:443'
         THEN substr(auth, 1, length(auth) - 4)
       ELSE auth END ||
  CASE WHEN pth = '' THEN '/' ELSE pth END ||
  CASE WHEN len(plist) = 0 THEN '' ELSE '?' || array_to_string(plist, '&') END
 END AS url_norm
FROM p ORDER BY doc_id"""


def _robots_txt(source: str) -> str:
    """Deterministic per-host robots.txt — parsed by the engine's
    from-scratch parser; the SQL twin constructs the equivalent RULE SET
    relationally (parse correctness itself is pinned by
    tests/test_robots.py)."""
    n = int(source[3:])
    lines = [
        f"# crawl policy for {source}",
        "User-agent: googlebot",
        "Disallow: /",
        "",
        "User-agent: *",
        "Disallow: /a/",
        "Allow: /a/ok/",
    ]
    if n % 2 == 0:
        lines.append("Disallow: /c/")
    lines += ["Disallow:", "Disallow: /x*y"]  # no-op + wildcard-subset drop
    return "\n".join(lines)


def _page_path(d: int) -> str:
    c = d % 4
    if c == 0:
        return f"/a/{d}"
    if c == 1:
        return f"/a/ok/{d}"
    if c == 2:
        return f"/b/{d}"
    return f"/c/{d}"


def robots_filter_table(sf_dir: str) -> ray.data.Dataset:
    """Driver query ``robots_filter``: (doc_id, host, path, allowed) —
    longest-match robots exclusion over deterministically rendered
    policies (stages/robots.py).  The distinct-host pass here is a tiny
    column read; at crawl scale it is one coarse dedup over the host
    column feeding the same filter stage."""
    import pyarrow.parquet as _pq

    from ..stages.robots import robots_filter_stage

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def to_pages(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        srcs = batch.column("source").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "host": pa.array(
                    [f"{s}.example" for s in srcs], type=pa.string()
                ),
                "path": pa.array(
                    [_page_path(int(d)) for d in ids], type=pa.string()
                ),
            }
        )

    pages = docs.map_batches(
        to_pages, batch_format="pyarrow", zero_copy_batch=True
    )
    srcs = sorted(
        set(
            _pq.read_table(
                f"{sf_dir}/documents.parquet", columns=["source"]
            )["source"].to_pylist()
        )
    )
    robots = ray.data.from_arrow(
        pa.table(
            {
                "host": pa.array([f"{s}.example" for s in srcs]),
                "robots_txt": pa.array([_robots_txt(s) for s in srcs]),
            }
        )
    )
    return robots_filter_stage(pages, robots)


def robots_filter_sql() -> str:
    return """
WITH src AS (SELECT DISTINCT source FROM documents),
rules AS (
  SELECT source || '.example' AS host, FALSE AS allow, '/a/' AS rp FROM src
  UNION ALL
  SELECT source || '.example', TRUE, '/a/ok/' FROM src
  UNION ALL
  SELECT source || '.example', FALSE, '/c/' FROM src
   WHERE CAST(substr(source, 4) AS INT) % 2 = 0),
p AS (SELECT doc_id, source || '.example' AS host,
  CASE doc_id % 4
    WHEN 0 THEN '/a/' || CAST(doc_id AS VARCHAR)
    WHEN 1 THEN '/a/ok/' || CAST(doc_id AS VARCHAR)
    WHEN 2 THEN '/b/' || CAST(doc_id AS VARCHAR)
    ELSE '/c/' || CAST(doc_id AS VARCHAR) END AS path
  FROM documents),
m AS (SELECT p.doc_id, r.allow,
        row_number() OVER (PARTITION BY p.doc_id
          ORDER BY length(r.rp) DESC, r.allow DESC) AS rn
      FROM p JOIN rules r ON p.host = r.host AND starts_with(p.path, r.rp))
SELECT p.doc_id, p.host, p.path,
       COALESCE(m.allow, TRUE) AS allowed
FROM p LEFT JOIN (SELECT doc_id, allow FROM m WHERE rn = 1) m USING (doc_id)
ORDER BY p.doc_id"""


_BOILERPLATE = (
    "boilerplate terms of service text page copyright notice all rights "
    "reserved contact us privacy policy cookie settings " * 2
).strip()


def crawl_export_table(sf_dir: str) -> ray.data.Dataset:
    """Capstone driver query ``crawl_export``: the whole crawl→corpus arc
    as ONE pipeline — render (with injected boilerplate duplicates) →
    robots longest-match filter → HTML→text extraction → token-count
    quality floor → exact-text dedup (keep lowest doc_id) → (doc_id,
    n_tok).

    Every stage is the REAL operator (stages/robots.py, stages/html.py,
    coarse-partition dedup); the SQL twin chains the same rule sets, so
    the driver hash checks the composition end to end.  Docs with
    ``doc_id % 7 == 3`` share one boilerplate body (the dedup stage's
    prey); the robots rules and page paths are the ``robots_filter``
    spec.  The html column rides through the robots co-partition — at
    crawl scale the filter runs at fetch time before payloads are wide,
    or on (host, path, doc_id) with a semi-join back; carrying it here
    keeps the checked pipeline one pass."""
    import re as _re

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as _pq

    from ..functions.groups import coarse_grouped, str_pid
    from ..spec import TOKEN_PATTERN
    from ..stages.html import html_to_text
    from ..stages.robots import robots_filter_stage

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    n = ds.count()

    def render(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        srcs = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        hosts, paths, htmls = [], [], []
        for d, s, t in zip(ids, srcs, texts):
            d = int(d)
            # boilerplate docs share body AND render identity (title, h1,
            # links), so their EXTRACTED texts are byte-identical and the
            # dedup stage genuinely removes rows; host/path stay per-doc
            # (the robots stage needs them)
            if d % 7 == 3:
                body, rid = _BOILERPLATE, 3
            else:
                body, rid = t, d
            hosts.append(f"{s}.example")
            paths.append(_page_path(d))
            htmls.append(render_page(rid, body, n)[1])
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "host": pa.array(hosts, type=pa.string()),
                "path": pa.array(paths, type=pa.string()),
                "html": pa.array(htmls, type=pa.string()),
            }
        )

    pages = ds.map_batches(render, batch_format="pyarrow", zero_copy_batch=True)
    srcs = sorted(
        set(
            _pq.read_table(
                f"{sf_dir}/documents.parquet", columns=["source"]
            )["source"].to_pylist()
        )
    )
    robots = ray.data.from_arrow(
        pa.table(
            {
                "host": pa.array([f"{s}.example" for s in srcs]),
                "robots_txt": pa.array([_robots_txt(s) for s in srcs]),
            }
        )
    )
    decided = robots_filter_stage(
        pages, robots, id_cols=("doc_id", "html")
    )
    tok = _re.compile(TOKEN_PATTERN)

    def extract_and_floor(batch: pa.Table) -> pa.Table:
        keep = batch.column("allowed").to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(keep))
        ids, texts, ntoks = [], [], []
        for d, h in zip(
            batch.column("doc_id").to_pylist(), batch.column("html").to_pylist()
        ):
            text = html_to_text(h)
            nt = len(tok.findall(text.lower()))
            if nt >= 30:
                ids.append(int(d))
                texts.append(text)
                ntoks.append(nt)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
                "n_tok": pa.array(ntoks, type=pa.int64()),
            }
        )

    kept = decided.map_batches(
        extract_and_floor, batch_format="pyarrow", zero_copy_batch=True
    )

    def dedup_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values("doc_id", kind="mergesort").groupby(
            "text", sort=False, as_index=False
        ).first()
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(dtype=np.int64),
                "n_tok": g["n_tok"].to_numpy(dtype=np.int64),
            }
        )

    return coarse_grouped(
        kept, lambda b: str_pid(b, "text", 64), dedup_part
    )


def crawl_export_sql() -> str:
    """Chained twin of :func:`crawl_export_table` — robots rules, html
    construction, extraction chain and dedup all inline."""
    from ..stages.html import (
        COMMENT_RE,
        SCRIPT_RE,
        STYLE_RE,
        TAG_RE,
        WS_RE,
    )

    x = "html"
    for pat in (SCRIPT_RE, STYLE_RE, COMMENT_RE, TAG_RE):
        x = f"regexp_replace({x}, '{_sql_quote(pat)}', ' ', 'g')"
    x = _entity_chain(x)
    strip_set = "' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)"
    x = f"trim(regexp_replace({x}, '{_sql_quote(WS_RE)}', ' ', 'g'), {strip_set})"
    dst = lambda off: (  # noqa: E731
        f"CAST((b.rid*131 + {off}) % (SELECT c FROM hn) AS VARCHAR)"
    )
    return f"""
WITH hn AS (SELECT COUNT(*) AS c FROM documents),
src AS (SELECT DISTINCT source FROM documents),
rules AS (
  SELECT source || '.example' AS host, FALSE AS allow, '/a/' AS rp FROM src
  UNION ALL SELECT source || '.example', TRUE, '/a/ok/' FROM src
  UNION ALL SELECT source || '.example', FALSE, '/c/' FROM src
   WHERE CAST(substr(source, 4) AS INT) % 2 = 0),
body AS (SELECT doc_id, source,
  CASE WHEN doc_id % 7 = 3 THEN '{_BOILERPLATE}' ELSE text END AS btext,
  CASE WHEN doc_id % 7 = 3 THEN 3 ELSE doc_id END AS rid
  FROM documents),
hl AS (SELECT b.doc_id, COALESCE(string_agg(CASE
   WHEN js.j = 0 THEN '<A HREF="HTTPS://CORPUS.example/d/' || {dst(7)} || '#top">see d' || {dst(7)} || ' guide</A>'
   WHEN js.j = 1 THEN '<a href="/d/' || {dst(24)} || '">read d' || {dst(24)} || '</a>'
   WHEN js.j = 2 THEN '<a rel="nofollow" href="https://corpus.example/d/' || {dst(41)} || '">more about d' || {dst(41)} || '</a>'
  END, '' ORDER BY js.j), '') AS links
  FROM body b LEFT JOIN (SELECT UNNEST(range(3)) AS j) js
    ON js.j < b.rid % 4
  GROUP BY b.doc_id),
cp AS (SELECT b.doc_id, b.source || '.example' AS host,
  CASE b.doc_id % 4
    WHEN 0 THEN '/a/' || CAST(b.doc_id AS VARCHAR)
    WHEN 1 THEN '/a/ok/' || CAST(b.doc_id AS VARCHAR)
    WHEN 2 THEN '/b/' || CAST(b.doc_id AS VARCHAR)
    ELSE '/c/' || CAST(b.doc_id AS VARCHAR) END AS path,
  '<html><head><title>T ' || CAST(b.rid AS VARCHAR)
  || '</title><style type="text/css">p {{color:red}}</style><script src="/j.js">var i = 1 < 2;</script></head><body><h1>Doc '
  || CAST(b.rid AS VARCHAR) || '</h1><p id="b">' || b.btext
  || '</p><!-- c -->' || hl.links
  || '<a href="mailto:x@y.z">m</a><a href="//cdn.example/x">p</a> &amp;amp; 1 &lt; 2&nbsp;&#39;&quot;</body></html>'
  AS html
  FROM body b JOIN hl USING (doc_id)),
mt AS (SELECT cp.doc_id, r.allow,
        row_number() OVER (PARTITION BY cp.doc_id
          ORDER BY length(r.rp) DESC, r.allow DESC) AS rn
      FROM cp JOIN rules r ON cp.host = r.host AND starts_with(cp.path, r.rp)),
alw AS (SELECT cp.doc_id, cp.html FROM cp
  LEFT JOIN (SELECT doc_id, allow FROM mt WHERE rn = 1) m USING (doc_id)
  WHERE COALESCE(m.allow, TRUE)),
etx AS (SELECT doc_id, {x} AS text FROM alw),
tk AS (SELECT doc_id, text,
        len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS n_tok
       FROM etx),
kept AS (SELECT * FROM tk WHERE n_tok >= 30),
ded AS (SELECT doc_id, n_tok,
        row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM kept)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok FROM ded WHERE rn = 1
ORDER BY doc_id"""


def anchor_terms_real_table(sf_dir: str) -> ray.data.Dataset:
    """Driver query ``anchor_terms_real``: per-target anchor-term counts
    from REAL extracted ``<a>`` elements (stages/html.py::
    extract_anchors_stage) — the crawl-native replacement for the
    hash-derived ``anchor_terms``: href canonicalized → url→doc_id hash
    join (anchor text rides the co-partition) → tokenize → one coarse
    (dst, term) count.  Output (doc_id, term, cnt)."""
    import re as _re

    import pandas as pd

    from ..functions.groups import coarse_grouped, str_pid
    from ..spec import TOKEN_PATTERN
    from ..stages.html import extract_anchors_stage, resolve_links

    pages = rendered_pages(sf_dir)
    anchors = extract_anchors_stage(pages)
    mapping = pages.map_batches(
        lambda b: b.select(["doc_id", "url"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    resolved = resolve_links(anchors, mapping, carry_cols=("anchor",))
    tok = _re.compile(TOKEN_PATTERN)

    def explode(batch: pa.Table) -> pa.Table:
        dsts, terms = [], []
        for d, a in zip(
            batch.column("dst").to_pylist(), batch.column("anchor").to_pylist()
        ):
            for t in tok.findall(a.lower()):
                dsts.append(int(d))
                terms.append(t)
        return pa.table(
            {
                "doc_id": pa.array(dsts, type=pa.int64()),
                "term": pa.array(terms, type=pa.string()),
            }
        )

    pairs = resolved.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )

    def count_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["doc_id", "term"], sort=False, as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    return coarse_grouped(
        pairs, lambda b: str_pid(b, "term", 64), count_part
    )


def _real_anchor_ctes() -> str:
    """CTE chain ``az → ac → rl → at`` yielding ``at(dst, term)`` — one
    row per anchor-text token occurrence pointing at a resolved in-corpus
    target.  Twin of ``extract_anchors_stage`` + ``resolve_links`` +
    token explode (assumes ``hpages`` from :func:`_html_ctes` in scope)."""
    from ..stages.html import ANCHOR_RE, ORIGIN_RE

    apat = _sql_quote(ANCHOR_RE)
    origin = _sql_quote(ORIGIN_RE)
    canon = f"""CASE
   WHEN split_part(pr[1], '#', 1) = '' THEN NULL
   WHEN lower(split_part(pr[1], '#', 1)) LIKE 'http://%'
     OR lower(split_part(pr[1], '#', 1)) LIKE 'https://%'
     THEN lower(regexp_extract(split_part(pr[1], '#', 1), '{origin}', 1))
          || regexp_extract(split_part(pr[1], '#', 1), '{origin}', 2)
   WHEN split_part(pr[1], '#', 1) LIKE '//%' THEN NULL
   WHEN split_part(pr[1], '#', 1) LIKE '/%'
     THEN lower(regexp_extract(url, '{origin}', 1)) || split_part(pr[1], '#', 1)
   ELSE NULL END"""
    return f"""az AS (SELECT doc_id, url,
  UNNEST(list_zip(regexp_extract_all(html, '{apat}', 1),
                  regexp_extract_all(html, '{apat}', 2))) AS pr
  FROM hpages),
ac AS (SELECT {canon} AS href, pr[2] AS anchor FROM az),
rl AS (SELECT m.doc_id AS dst, a.anchor
       FROM ac a JOIN hpages m ON a.href = m.url),
at AS (SELECT dst, UNNEST(regexp_extract_all(lower(anchor), '[a-z0-9_]+')) AS term
       FROM rl)"""


def crawl_frontier_table(
    sf_dir: str, seeds: list[int], max_depth: int = 3
) -> pa.Table:
    """Driver query ``crawl_frontier``: min discovery depth per page
    reachable from the seeds over the REAL extracted link graph
    (functions/graph.py::crawl_frontier — level-synchronous BFS)."""
    import numpy as np

    import ray as _ray

    from ..functions.graph import crawl_frontier

    edges = link_edges(sf_dir)
    out = crawl_frontier(edges, seeds, max_depth=max_depth)
    tables = [
        t for t in (_ray.get(r) for r in out.to_arrow_refs()) if t.num_rows
    ]
    if not tables:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "depth": pa.array([], type=pa.int64()),
            }
        )
    tbl = pa.concat_tables(tables)
    ids = tbl.column("doc_id").to_numpy()
    dep = tbl.column("depth").to_numpy()
    order = np.argsort(ids, kind="stable")
    return pa.table(
        {
            "doc_id": pa.array(ids[order], type=pa.int64()),
            "depth": pa.array(dep[order], type=pa.int64()),
        }
    )


def crawl_frontier_sql(seeds: list[int], max_depth: int = 3) -> str:
    """Recursive-CTE twin: min depth per reachable node over the SAME
    rendered link graph; UNION (not UNION ALL) bounds the recursion by
    distinct (node, depth) pairs under cycles."""
    seed_vals = ", ".join(f"({int(x)})" for x in sorted(set(seeds)))
    return (
        "WITH RECURSIVE "
        + _html_ctes()
        + _links_cte()
        + f""",
ledges AS MATERIALIZED (SELECT h.doc_id AS src, m.doc_id AS dst
  FROM hrefs h JOIN hpages m ON h.href = m.url),
seeds(doc_id) AS (VALUES {seed_vals}),
walk(doc_id, depth) AS (
  SELECT doc_id, 0 FROM seeds
  UNION
  SELECT e.dst, w.depth + 1 FROM walk w JOIN ledges e ON e.src = w.doc_id
  WHERE w.depth < {int(max_depth)})
SELECT doc_id, MIN(depth) AS depth FROM walk
GROUP BY doc_id ORDER BY doc_id"""
    )


def anchor_terms_real_sql() -> str:
    return (
        "WITH "
        + _html_ctes()
        + ",\n"
        + _real_anchor_ctes()
        + """
SELECT dst AS doc_id, term, COUNT(*) AS cnt FROM at
GROUP BY dst, term ORDER BY doc_id, term"""
    )


def anchor_boosted_real_sql(bm25_cte: str, k: int = 10) -> str:
    """SQL twin of :func:`anchor_boosted_real_table`: the caller supplies
    the shared BM25 CTE block (defines ``scores(doc_id, s)`` and
    ``qt(term)``); the anchor side re-derives real anchor-token counts
    per target and fuses ``ROUND(s,6) + 0.25*cnt`` — dyadic weight ×
    int is exact, one IEEE add, so ``fused`` hashes exactly."""
    return (
        "WITH "
        + bm25_cte
        + ",\n"
        + _html_ctes()
        + ",\n"
        + _real_anchor_ctes()
        + f""",
acnt AS (SELECT dst AS doc_id, COUNT(*) AS cnt FROM at
         WHERE term IN (SELECT term FROM qt) GROUP BY dst)
SELECT s.doc_id, ROUND(s.s, 6) + 0.25 * COALESCE(acnt.cnt, 0) AS fused,
 CAST(row_number() OVER (
   ORDER BY ROUND(s.s, 6) + 0.25 * COALESCE(acnt.cnt, 0) DESC, s.doc_id
 ) AS INT) AS rank
FROM scores s LEFT JOIN acnt USING(doc_id)
ORDER BY fused DESC, s.doc_id LIMIT {k}"""
    )


def anchor_boosted_real_table(
    sf_dir: str, query: str, k: int = 10, weight: float = 0.25
) -> pa.Table:
    """BM25 + REAL anchor-text fusion: like ``anchor_boosted_table`` but
    the anchor field comes from extracted ``<a>`` elements instead of the
    hash-derived graph.  Query-term filtering happens inside the explode
    stage so only matching anchors shuffle; the per-dst count table is
    match-set bounded.  ``fused = ROUND(bm25,6) + weight*cnt`` with a
    dyadic weight — twin-identical by exact product + one IEEE add."""
    import re as _re

    import numpy as np
    import pandas as pd

    from ..functions.groups import coarse_grouped, int_pid
    from ..spec import TOKEN_PATTERN
    from ..stages.html import extract_anchors_stage, resolve_links
    from .corpus import DocumentsSearcher, orig_ids_streamed

    s = DocumentsSearcher(sf_dir)
    sr = s.searcher
    terms = sr.preprocess_query(query)
    tset = set(terms)
    iid, raw = sr._exact_scores(terms, sr.term_chunks(terms))
    ids = orig_ids_streamed(sr, iid)
    sc = np.round(raw, 6)
    fused = sc.copy()

    pages = rendered_pages(sf_dir)
    anchors = extract_anchors_stage(pages)
    mapping = pages.map_batches(
        lambda b: b.select(["doc_id", "url"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    resolved = resolve_links(anchors, mapping, carry_cols=("anchor",))
    tok = _re.compile(TOKEN_PATTERN)

    def explode_matching(batch: pa.Table) -> pa.Table:
        dsts, cnts = [], []
        for d, a in zip(
            batch.column("dst").to_pylist(), batch.column("anchor").to_pylist()
        ):
            c = sum(1 for t in tok.findall(a.lower()) if t in tset)
            if c:
                dsts.append(int(d))
                cnts.append(c)
        return pa.table(
            {
                "dst": pa.array(dsts, type=pa.int64()),
                "cnt": pa.array(cnts, type=pa.int64()),
            }
        )

    def sum_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("dst", sort=False, as_index=False)["cnt"].sum()
        return g

    counts = coarse_grouped(
        resolved.map_batches(
            explode_matching, batch_format="pyarrow", zero_copy_batch=True
        ),
        lambda b: int_pid(b, ["dst"], 64),
        sum_part,
    ).to_pandas()

    if len(counts) and ids.size:
        a_dst = counts["dst"].to_numpy(dtype=np.int64)
        a_cnt = counts["cnt"].to_numpy(dtype=np.int64)
        pos = np.searchsorted(ids, a_dst)
        pos[pos >= ids.size] = ids.size - 1
        live = ids[pos] == a_dst
        fused[pos[live]] += weight * a_cnt[live].astype(np.float64)
    order = np.lexsort((ids, -fused))[:k]
    return pa.table(
        {
            "doc_id": pa.array(ids[order], type=pa.int64()),
            "fused": pa.array(fused[order], type=pa.float64()),
            "rank": pa.array(
                np.arange(1, order.size + 1, dtype=np.int32), type=pa.int32()
            ),
        }
    )
