"""URL canonicalization — the crawl-dedup normalizer.

Common-Crawl-scale corpora carry the same page under many url spellings
(case-shifted hosts, default ports, tracker params, fragments, unsorted
query strings); url normalization is the cheap first-line dedup key before
any content hashing.  The spec below is deliberately SQL-reproducible —
every rule is a string/list operation DuckDB mirrors — so the driver twin
hash-checks it (query ``url_normalize``):

1. strip the fragment (``#...``)
2. if the remainder does not parse as ``scheme://authority[path][?query]``
   it is returned unchanged (post fragment strip)
3. lowercase scheme and authority; drop the default port (``:80`` for
   http, ``:443`` for https)
4. empty path → ``/``
5. query params split on ``&``: drop empties and ``utm_``-prefixed
   trackers, sort the rest lexicographically (bytewise — ASCII params;
   the twin's list_sort matches), rejoin; an empty result drops the ``?``

Stateless ``map_batches`` — per-row Python string ops (regexes compiled
once per worker), no shuffle; the dedup that typically follows
(groupby url_norm) is the caller's one coarse exchange.
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray.data

URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?]*)([^?]*)(?:\?(.*))?$"
_URL = re.compile(URL_RE)
_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def normalize_url(url: str) -> str:
    """The canonicalization spec above, as one pure function."""
    h = url.split("#", 1)[0]
    m = _URL.match(h)
    if m is None:
        return h
    scheme = m.group(1).lower()
    auth = m.group(2).lower()
    port = _DEFAULT_PORTS.get(scheme)
    if port and auth.endswith(port):
        auth = auth[: -len(port)]
    path = m.group(3) or "/"
    query = m.group(4)
    out = f"{scheme}://{auth}{path}"
    if query:
        params = sorted(
            p for p in query.split("&") if p and not p.startswith("utm_")
        )
        if params:
            out += "?" + "&".join(params)
    return out


def normalize_urls_stage(
    ds: ray.data.Dataset,
    *,
    url_col: str = "url",
    out_col: str = "url_norm",
) -> ray.data.Dataset:
    """Append ``out_col`` = canonical form of ``url_col``."""

    def run(batch: pa.Table) -> pa.Table:
        norm = [
            normalize_url(u) for u in batch.column(url_col).to_pylist()
        ]
        return batch.append_column(
            out_col, pa.array(norm, type=pa.string())
        )

    return ds.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)
