"""HTML → text extraction and hyperlink extraction for webtext corpora.

The reference treats ``.html`` as plain text (``vexor/services/
content_extract_service.py:73-74`` — ``.html``/``.htm`` sit in
``TEXT_EXTENSIONS`` and no tag stripping exists anywhere), which is
faithful for a local file-search tool but wrong for a Common-Crawl-scale
training-data pipeline: raw markup poisons tokenization, dedup shingles
and LM quality scores.  This module adds the missing web-native extraction
as a *specified, SQL-reproducible* transform: every step is a regular
expression or fixed string replacement that DuckDB's RE2 engine reproduces
exactly (the driver twin chains ``regexp_replace`` / ``regexp_extract_all``
over the very same pattern constants exported below), so the operator is
value-checkable end to end — not "approximately like bs4".

Extraction spec, applied in order (operates on ``str``; byte decoding
stays on the established ``refimpl/textnorm.py`` path upstream):

1. drop ``<script ...>...</script>`` blocks (case-insensitive, lazy,
   dot-matches-newline) → one space
2. drop ``<style ...>...</style>`` blocks the same way
3. drop ``<!-- comments -->`` (lazy, dotall) → one space
4. every remaining tag ``<[^>]*>`` → one space (an unterminated tag
   swallows to the next ``>`` — deterministic on both engines)
5. decode the fixed entity set ``&lt; &gt; &quot; &#39; &nbsp;`` and LAST
   ``&amp;`` — the order that leaves double-escaped text (``&amp;lt;`` →
   ``&lt;``) correctly single-decoded
6. collapse ``[ \\t\\n\\r\\f\\v]+`` runs to one space and strip (the class
   is spelled out because Python's ``\\s`` is Unicode-wide while RE2's is
   ASCII — an explicit class means ONE spec, not two dialects)

Link extraction: double-quoted ``href`` values of ``<a>`` tags in document
order, canonicalized against the page url:

- fragment (``#...``) stripped first
- absolute ``http(s)`` URLs: scheme+host lowercased, path kept verbatim
- root-relative (``/path``): page origin (lowercased ``scheme://host``)
  prepended
- everything else (``mailto:``, protocol-relative ``//host``, bare
  relative paths) dropped — a documented subset, mirrored rule-for-rule in
  the SQL twin

Scale notes: both stages are stateless ``map_batches`` over pyarrow
batches; regexes compile once per worker process at import.  ``html`` is
the wide column — run these early, keep ``batch_size`` modest, and project
the markup away in the output batch (the text stage emits id+text only).
Link resolution (href → doc id) is a string-keyed hash join done with the
repo's coarse-partition discipline (:func:`resolve_links`) — one shuffle
whose key is the canonical url, never a broadcast of a corpus-sized
mapping.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.groups import coarse_grouped, str_pid

# Pattern constants — the SQL twin interpolates these verbatim, so engine
# and oracle can never drift apart.  All are valid in both Python re and
# RE2 (lazy quantifiers, inline (?is) flags, explicit ASCII classes).
SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script\s*>"
STYLE_RE = r"(?is)<style\b[^>]*>.*?</style\s*>"
COMMENT_RE = r"(?s)<!--.*?-->"
TAG_RE = r"<[^>]*>"
WS_RE = r"[ \t\n\r\f\v]+"
HREF_RE = r"(?is)<a\b[^>]*?\bhref\s*=\s*\"([^\"]*)\""
ANCHOR_RE = r"(?is)<a\b[^>]*?\bhref\s*=\s*\"([^\"]*)\"[^>]*>(.*?)</a\s*>"
ORIGIN_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)(.*)$"

# (entity, replacement) in application order; &amp; is last on purpose.
ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

_SCRIPT = re.compile(SCRIPT_RE)
_STYLE = re.compile(STYLE_RE)
_COMMENT = re.compile(COMMENT_RE)
_TAG = re.compile(TAG_RE)
_WS = re.compile(WS_RE)
_HREF = re.compile(HREF_RE)
_ANCHOR = re.compile(ANCHOR_RE)
_ORIGIN = re.compile(ORIGIN_RE)


def html_to_text(html: str) -> str:
    """The extraction spec above, as one pure function (engine == oracle)."""
    s = _SCRIPT.sub(" ", html)
    s = _STYLE.sub(" ", s)
    s = _COMMENT.sub(" ", s)
    s = _TAG.sub(" ", s)
    for ent, rep in ENTITIES:
        s = s.replace(ent, rep)
    # strip the explicit ASCII class, not str.strip() — Python's default
    # strip is Unicode-wide while the SQL twin's trim set is this class
    return _WS.sub(" ", s).strip(" \t\n\r\f\v")


def canonicalize_href(base_url: str, href: str) -> str | None:
    """Canonical absolute url per the spec above, or None (dropped)."""
    h = href.split("#", 1)[0]
    if not h:
        return None
    low = h.lower()
    if low.startswith("http://") or low.startswith("https://"):
        m = _ORIGIN.match(h)
        if m is None:  # pragma: no cover - startswith guarantees a match
            return None
        return m.group(1).lower() + m.group(2)
    if h.startswith("//") or not h.startswith("/"):
        return None
    m = _ORIGIN.match(base_url)
    if m is None:
        return None
    return m.group(1).lower() + h


def extract_hrefs(base_url: str, html: str) -> list[str]:
    """Canonicalized double-quoted ``<a href>`` values in document order."""
    out = []
    for raw in _HREF.findall(html):
        c = canonicalize_href(base_url, raw)
        if c is not None:
            out.append(c)
    return out


def extract_anchors(base_url: str, html: str) -> list[tuple[str, str]]:
    """``(canonical_href, anchor_text)`` pairs in document order — the
    REAL anchor-text source for link-context aggregation (BM25F anchor
    fields, ``functions/anchors.py``).  Only links whose ``<a>`` element
    closes (``</a>``) yield a pair; href canonicalization and the kept/
    dropped rules are :func:`canonicalize_href`.  The anchor text is the
    raw inner markup — tokenize downstream (the twin does the same with
    list_zip over two regexp_extract_all groups)."""
    out = []
    for raw, text in _ANCHOR.findall(html):
        c = canonicalize_href(base_url, raw)
        if c is not None:
            out.append((c, text))
    return out


def extract_anchors_stage(
    ds: ray.data.Dataset,
    *,
    html_col: str = "html",
    url_col: str = "url",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> ray.data.Dataset:
    """``(ids..., url, html) → (ids..., href, anchor)``."""

    def run(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        htmls = batch.column(html_col).to_pylist()
        reps: list[int] = []
        hrefs: list[str] = []
        anchors: list[str] = []
        for u, h in zip(urls, htmls):
            pairs = extract_anchors(u, h)
            reps.append(len(pairs))
            hrefs.extend(p[0] for p in pairs)
            anchors.extend(p[1] for p in pairs)
        idx = np.repeat(np.arange(batch.num_rows), reps)
        cols = {c: batch.column(c).take(pa.array(idx)) for c in id_cols}
        cols["href"] = pa.array(hrefs, type=pa.string())
        cols["anchor"] = pa.array(anchors, type=pa.string())
        return pa.table(cols)

    return ds.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)


def html_text_stage(
    ds: ray.data.Dataset,
    *,
    html_col: str = "html",
    id_cols: tuple[str, ...] = ("doc_id",),
    out_col: str = "text",
) -> ray.data.Dataset:
    """``(ids..., html:string) → (ids..., text)`` — markup projected away."""

    def run(batch: pa.Table) -> pa.Table:
        texts = [html_to_text(h) for h in batch.column(html_col).to_pylist()]
        cols = {c: batch.column(c) for c in id_cols}
        cols[out_col] = pa.array(texts, type=pa.string())
        return pa.table(cols)

    return ds.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)


def extract_links_stage(
    ds: ray.data.Dataset,
    *,
    html_col: str = "html",
    url_col: str = "url",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> ray.data.Dataset:
    """``(ids..., url, html) → (ids..., link_pos:int32, href:string)``.

    One output row per kept link, ``link_pos`` = 0-based document order
    among KEPT links (post-canonicalization — the twin's UNNEST ordinality
    over the filtered list matches).
    """

    def run(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        htmls = batch.column(html_col).to_pylist()
        reps: list[int] = []
        pos: list[int] = []
        hrefs: list[str] = []
        for i, (u, h) in enumerate(zip(urls, htmls)):
            links = extract_hrefs(u, h)
            reps.append(len(links))
            pos.extend(range(len(links)))
            hrefs.extend(links)
        idx = np.repeat(np.arange(batch.num_rows), reps)
        cols = {c: batch.column(c).take(pa.array(idx)) for c in id_cols}
        cols["link_pos"] = pa.array(pos, type=pa.int32())
        cols["href"] = pa.array(hrefs, type=pa.string())
        return pa.table(cols)

    return ds.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)


def resolve_links(
    links: ray.data.Dataset,
    mapping: ray.data.Dataset,
    *,
    src_col: str = "doc_id",
    href_col: str = "href",
    map_url_col: str = "url",
    map_id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
    n_parts: int = 64,
) -> ray.data.Dataset:
    """Inner-join extracted links to page ids → edges ``(src, dst)``.

    Coarse string-hash co-partition of both sides on the canonical url (the
    tag-union discipline of ``functions/graph.py``): links that resolve to
    no crawled page (dead links) drop out, links to the same page keep one
    edge PER OCCURRENCE (PageRank mass follows link multiplicity — same as
    the SQL twin's plain inner join).  ``carry_cols`` ride from the links
    side into the output (e.g. the anchor text); the mapping side fills
    them with type-matched empties.
    """
    carry_types = {
        c: links.schema().base_schema.field(c).type for c in carry_cols
    }

    def tag_link(b: pa.Table) -> pa.Table:
        cols = {
            "key": pc.cast(b.column(href_col), pa.large_string()),
            "src": pc.cast(b.column(src_col), pa.int64()),
            "flag": pa.array(np.ones(b.num_rows, dtype=np.int8)),
        }
        for c in carry_cols:
            cols[c] = b.column(c)
        return pa.table(cols)

    def tag_map(b: pa.Table) -> pa.Table:
        cols = {
            "key": pc.cast(b.column(map_url_col), pa.large_string()),
            "src": pc.cast(b.column(map_id_col), pa.int64()),
            "flag": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
        }
        for c in carry_cols:
            t = carry_types[c]
            cols[c] = pa.array(
                [b"" if pa.types.is_binary(t) else ""] * b.num_rows, type=t
            )
        return pa.table(cols)

    tagged = links.map_batches(
        tag_link, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        mapping.map_batches(tag_map, batch_format="pyarrow", zero_copy_batch=True)
    )

    def join_part(df: pd.DataFrame) -> pd.DataFrame:
        is_map = df["flag"].to_numpy() == 0
        keys = df["key"].to_numpy()
        mp_keys = keys[is_map]
        order = np.argsort(mp_keys, kind="stable")
        mp_keys = mp_keys[order]
        mp_ids = df["src"].to_numpy()[is_map][order]
        ln_keys = keys[~is_map]
        ln_src = df["src"].to_numpy()[~is_map]
        if ln_keys.size == 0 or mp_keys.size == 0:
            empty = {"src": np.array([], dtype=np.int64),
                     "dst": np.array([], dtype=np.int64)}
            for c in carry_cols:
                empty[c] = np.array([], dtype=object)
            return pd.DataFrame(empty)
        pos = np.searchsorted(mp_keys, ln_keys)
        pos_c = np.minimum(pos, mp_keys.size - 1)
        live = mp_keys[pos_c] == ln_keys
        out = {
            "src": ln_src[live].astype(np.int64),
            "dst": mp_ids[pos_c[live]].astype(np.int64),
        }
        for c in carry_cols:
            out[c] = df[c].to_numpy()[~is_map][live]
        return pd.DataFrame(out)

    return coarse_grouped(
        tagged, lambda b: str_pid(b, "key", n_parts), join_part
    )
