"""Deterministic synthetic Common-Crawl-style ``pages`` table + query set.

Schema (BASELINE.json ``input_hint``): ``url:string, warc_ts:timestamp[us],
html:binary, text:string, lang:string``.  Seeded (42), no wall clock, no
network; see FIXTURES.md for the generation contract.

Word distribution is Zipfian (exponent ~1.1 over a ~20k-word pool) so term
document frequency is realistically skewed — this is what exercises hot-term
salting.  Controlled "needle" terms with known df ∈ {1, 2, 10, 100} give
hand-checkable IDF values; underscore identifiers, CJK rows, ``\\r\\n``
line endings, truncated/invalid UTF-8 tails, and duplicate-text page pairs
exercise the tokenizer / decode / tie-break edge cases.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_EPOCH = _dt.datetime(2026, 1, 1, 0, 0, 0, tzinfo=_dt.timezone.utc)
_TS_STRIDE_S = 137

NEEDLES = {
    "needledfone": 1,
    "needledftwo": 2,
    "needledften": 10,
    "needledfhundred": 100,
}
UNDERSCORE_IDENT = "_zz_apply_rerank"
ABSENT_TERM = "qqqzzzabsentterm"
_CJK = "中文测试网页内容搜索引擎数据处理分布式系统"


def _word_pool(rng: np.random.Generator, size: int = 20_000) -> list[str]:
    consonants = list("bcdfghjklmnpqrstvwz")
    vowels = list("aeiou")
    pool: set[str] = set()
    words: list[str] = []
    while len(words) < size:
        n_syl = int(rng.integers(1, 4))
        w = "".join(
            consonants[int(rng.integers(0, len(consonants)))]
            + vowels[int(rng.integers(0, len(vowels)))]
            for _ in range(n_syl)
        )
        if w not in pool:
            pool.add(w)
            words.append(w)
    return words


def generate_pages(n_rows: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    pool = _word_pool(rng)
    pool_arr = np.asarray(pool)
    ranks = np.arange(1, len(pool) + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.1
    probs /= probs.sum()

    # body lengths: mostly 50-400 words, long tail up to ~40k words (~200KB+)
    lengths = rng.integers(50, 400, size=n_rows)
    tail = rng.random(n_rows) < 0.003
    lengths = np.where(tail, rng.integers(20_000, 45_000, size=n_rows), lengths)

    total_words = int(lengths.sum())
    all_words = rng.choice(pool_arr, size=total_words, p=probs)
    offsets = np.concatenate([[0], np.cumsum(lengths)])

    langs = rng.choice(["en", "zh", "de"], size=n_rows, p=[0.90, 0.05, 0.05])
    sites = rng.integers(0, 500, size=n_rows)
    slugs = rng.choice(pool_arr, size=(n_rows, 2))
    paths = rng.choice(pool_arr, size=n_rows)

    ident_rows = set(range(3, n_rows, max(n_rows // 25, 1)))
    crlf_rows = set(range(5, n_rows, max(n_rows // 40, 1)))
    trunc_tail_rows = set(range(7, n_rows, max(n_rows // 30, 1)))
    bad_utf8_rows = set(range(11, n_rows, max(n_rows // 15, 1) * 3))

    dup_src: dict[int, int] = {}  # dup row -> source row (identical body)
    for j in range(2):
        a = 13 + j * max(n_rows // 10, 1)
        b = a + 1
        if b < n_rows:
            dup_src[b] = a
    # keep the tie pair survivable and tokenizable
    for i in list(dup_src.items()):
        for r in i:
            bad_utf8_rows.discard(r)
            crlf_rows.discard(r)
            trunc_tail_rows.discard(r)
            ident_rows.discard(r)
            langs[r] = "en"

    # needle injection: deterministic slots, skipping rows whose decode goes
    # through the charset-fallback arm (bad utf8 — detector may mangle
    # non-ASCII neighborhoods), CJK bodies, and the duplicate pair
    def _eligible(i: int) -> bool:
        return (
            i < n_rows
            and i not in bad_utf8_rows
            and langs[i] != "zh"
            and i not in dup_src
            and i not in dup_src.values()
        )

    eligible_rows = [i for i in range(n_rows) if _eligible(i)]
    needle_slots: dict[int, list[str]] = {}
    for term, df in NEEDLES.items():
        if df >= len(eligible_rows):
            raise ValueError(f"corpus too small for needle {term} (df={df})")
        step = len(eligible_rows) / (df + 1)
        for j in range(1, df + 1):
            i = eligible_rows[int(j * step)]
            needle_slots.setdefault(i, []).append(term)

    urls: list[str] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    ts: list[int] = []
    base_us = int(_EPOCH.timestamp()) * 1_000_000

    bodies: list[str] = []
    for i in range(n_rows):
        if i in dup_src:
            body = bodies[dup_src[i]]
        elif langs[i] == "zh":
            k = int(rng.integers(10, 60))
            idx = rng.integers(0, len(_CJK), size=k)
            body = "".join(_CJK[int(x)] for x in idx)
        else:
            words = all_words[offsets[i] : offsets[i + 1]].tolist()
            extra = needle_slots.get(i, [])
            if extra:
                # keep needles within the FULL_CHAR_LIMIT cap even on
                # long-tail pages: insert near the front
                pos = min(len(words) // 2, 25)
                words = words[:pos] + extra + words[pos:]
            if i in ident_rows:
                words.append(UNDERSCORE_IDENT)
            body = " ".join(words)
        bodies.append(body)

    for i in range(n_rows):
        body = bodies[i]
        if i in dup_src:
            # same token-count url shape as the source row → exact score tie
            src = dup_src[i]
            urls.append(
                f"https://site{sites[i]:04d}.example/{paths[src]}/"
                f"{slugs[src][0]}-{slugs[src][1]}-{i:08d}.html"
            )
        else:
            urls.append(
                f"https://site{sites[i]:04d}.example/{paths[i]}/"
                f"{slugs[i][0]}-{slugs[i][1]}-{i:08d}.html"
            )
        title = body[:60]
        paragraphs = body
        if i in crlf_rows:
            mid = len(paragraphs) // 2
            paragraphs = paragraphs[:mid] + "\r\n" + paragraphs[mid:]
        html = (
            f"<html><head><title>{title}</title></head>"
            f"<body>{paragraphs}</body></html>"
        ).encode("utf-8")
        if i in bad_utf8_rows:
            # invalid byte mid-stream → strict UTF-8 arm fails → page decodes
            # through the charset-fallback arm (exercises the legacy path)
            html = html[: len(html) // 2] + b"\xff\xfe" + html[len(html) // 2 :]
        elif i in trunc_tail_rows:
            # valid prefix of a multi-byte char at the very end → tolerated
            html = html + "中".encode("utf-8")[:2]
        htmls.append(html)
        texts.append(body)
        ts.append(base_us + i * _TS_STRIDE_S * 1_000_000)

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs.tolist(), type=pa.string()),
        }
    )


def generate_queries(n_queries: int = 120, seed: int = 42) -> list[dict]:
    """Reference query set (expected results computed by the oracle at test time)."""
    rng = np.random.default_rng(seed + 1)
    pool = _word_pool(np.random.default_rng(seed))
    queries: list[dict] = []

    def add(q: str, k: int = 10) -> None:
        queries.append({"query_id": len(queries) + 1, "query": q, "k": k})

    for term in NEEDLES:
        add(term)
        add(f"{term} retrieval engine")
    add(UNDERSCORE_IDENT)
    add(f"{UNDERSCORE_IDENT} fallback path")
    add(ABSENT_TERM)
    add(f"{ABSENT_TERM} {pool[0]}")
    add(pool[0])  # hottest term
    add(" ".join(pool[:3]))  # stop-word-frequency multi-term
    add(" ".join(pool[:40]))  # >32 terms → cap
    add(f"{pool[5]} {pool[5]} {pool[5]} {pool[9]}")  # duplicate terms → dedup
    add("中文测试")  # pure CJK → no regex tokens → empty result
    add("!!!")
    while len(queries) < n_queries:
        n_terms = int(rng.integers(1, 8))
        idx = rng.integers(0, 2000, size=n_terms)
        add(" ".join(pool[int(i)] for i in idx), k=int(rng.choice([5, 10, 20])))
    return queries


def write_pages(
    out_dir: str | Path,
    n_rows: int,
    seed: int = 42,
    rows_per_file: int = 10_000,
) -> Path:
    """Write the pages table as multiple parquet parts (resumable-shard layout).

    Cached: if the directory already holds a matching ``_meta.json``, reuse it.
    """
    out = Path(out_dir)
    meta_path = out / "_meta.json"
    meta = {"n_rows": n_rows, "seed": seed, "rows_per_file": rows_per_file}
    if meta_path.exists():
        try:
            if json.loads(meta_path.read_text()) == meta:
                return out
        except (json.JSONDecodeError, OSError):
            pass
    table = generate_pages(n_rows, seed)
    out.mkdir(parents=True, exist_ok=True)
    for old in out.glob("part-*.parquet"):
        old.unlink()
    n_parts = max((n_rows + rows_per_file - 1) // rows_per_file, 1)
    for p in range(n_parts):
        part = table.slice(p * rows_per_file, rows_per_file)
        # modest row groups → one read task per row group in the engine's
        # fragment plan (a single-row-group shard serializes its read)
        pq.write_table(
            part, out / f"part-{p:05d}.parquet", row_group_size=4096
        )
    tmp = out / "_meta.json.tmp"
    tmp.write_text(json.dumps(meta))
    os.replace(tmp, meta_path)
    return out
