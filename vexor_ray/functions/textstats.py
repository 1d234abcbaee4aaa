"""Text-analysis operators for large-scale training-data pipelines.

All are vectorized ``map_batches`` stages over a ``documents``-shaped table
``(doc_id:int64, text:string, lang:string, ...)``: token counting, language
ID (n-gram/stopword heuristic), quality scoring (length / alpha / stopword
ratios), and document fingerprinting.  Each has a DuckDB-SQL-expressible
definition (see ``__ray_entry__.oracle_sql``) so correctness is
oracle-checked, and each is linear-scan + shuffle-free → trivially scales.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from ..spec import TOKEN_RE
from ._pool import launch_stage as _launch_stage

# tiny fixed stopword lists per language for the langid heuristic
_LANG_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "that", "for", "it"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"},
}


def token_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → (doc_id, n_tokens) with the spec tokenizer."""
    texts = batch.column("text").to_pylist()
    counts = [len(TOKEN_RE.findall(t.lower())) if t else 0 for t in texts]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(counts, type=pa.int64()),
        }
    )


def _round6_half_up(x: float) -> float:
    """Round-half-up to 6 places (SQL ROUND semantics; Python's round() is
    banker's rounding and disagrees on exact .5 boundaries, e.g. 105/128)."""
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality features: n_chars, n_tokens, alpha_ratio, stop_ratio (rounded 6)."""
    texts = batch.column("text").to_pylist()
    n_chars, n_tokens, alpha_ratio, stop_ratio = [], [], [], []
    stop = _LANG_STOPWORDS["en"]
    for t in texts:
        t = t or ""
        toks = TOKEN_RE.findall(t.lower())
        n_chars.append(len(t))
        n_tokens.append(len(toks))
        n_alpha = sum(ch.isalpha() for ch in t)
        alpha_ratio.append(_round6_half_up(n_alpha / len(t)) if t else 0.0)
        n_stop = sum(tok in stop for tok in toks)
        stop_ratio.append(_round6_half_up(n_stop / len(toks)) if toks else 0.0)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": pa.array(n_chars, type=pa.int64()),
            "n_tokens": pa.array(n_tokens, type=pa.int64()),
            "alpha_ratio": pa.array(alpha_ratio, type=pa.float64()),
            "stop_ratio": pa.array(stop_ratio, type=pa.float64()),
        }
    )


class LangId:
    """Actor-pool language ID: stopword-hit ratio per candidate language.

    Stateful stage (stopword sets + compiled regex built once per actor) —
    the classifier is a deterministic heuristic: argmax language by stopword
    hit count, ``und`` (undetermined) when no stopword hits at all.
    """

    def __init__(self):
        import re

        self._re = re.compile(TOKEN_RE.pattern)
        self._stop = {k: frozenset(v) for k, v in _LANG_STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        langs = []
        for t in texts:
            toks = self._re.findall((t or "").lower())
            best_lang, best_hits = "und", 0
            for lang in sorted(self._stop):  # deterministic tie-break by name
                hits = sum(tok in self._stop[lang] for tok in toks)
                if hits > best_hits:
                    best_lang, best_hits = lang, hits
            langs.append(best_lang)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(langs, type=pa.string()),
            }
        )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → (doc_id, fp) where fp = md5 hex of the raw text."""
    texts = batch.column("text").to_pylist()
    fps = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fp": pa.array(fps, type=pa.string()),
        }
    )


def rolling_hash_batch(batch: pa.Table, *, window: int = 16) -> pa.Table:
    """Rabin-Karp-style rolling fingerprint: min rolling hash over byte windows.

    Deterministic content sketch used for shift-robust near-dup candidates
    (not SQL-expressible; checked rows-only + by unit test).
    """
    texts = batch.column("text").to_pylist()
    out = []
    base, mod = 257, (1 << 31) - 1  # products stay < 2^43, no uint64 overflow
    weights = np.array(
        [pow(base, window - 1 - j, mod) for j in range(window)], dtype=np.uint64
    )
    for t in texts:
        data = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8).astype(
            np.uint64
        )
        if data.size == 0:
            out.append(0)
            continue
        if data.size < window:
            h = 0
            for x in data.tolist():
                h = (h * base + x) % mod
            out.append(h)
            continue
        windows = np.lib.stride_tricks.sliding_window_view(data, window)
        hashes = (windows * weights).sum(axis=1) % np.uint64(mod)
        out.append(int(hashes.min()))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "rolling_min_hash": pa.array(out, type=pa.uint64()),
        }
    )


_KEYWORD_MIN_LEN = 3
_KEYWORD_LIMIT = 20


def keywords_batch(batch: pa.Table, *, limit: int = _KEYWORD_LIMIT) -> pa.Table:
    """Top-k keyword brief per doc (the reference's BriefStrategy shape:
    words ≥ 3 chars, stopwords dropped, ``Counter.most_common`` order —
    count desc then first-seen; ``services/keyword_service.py:67-107``).
    """
    from collections import Counter

    stop = _LANG_STOPWORDS["en"]
    texts = batch.column("text").to_pylist()
    out = []
    for t in texts:
        toks = [
            w
            for w in TOKEN_RE.findall((t or "").lower())
            if len(w) >= _KEYWORD_MIN_LEN and w not in stop
        ]
        out.append([w for w, _ in Counter(toks).most_common(limit)])
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "keywords": pa.array(out, type=pa.list_(pa.string())),
        }
    )


def keywords_exploded_batch(
    batch: pa.Table, *, limit: int = _KEYWORD_LIMIT
) -> pa.Table:
    """Keyword brief as flat rows (doc_id, kw_rank, keyword) — same ranking
    as ``keywords_batch`` (count desc, first-seen asc), SQL-checkable form."""
    from collections import Counter

    stop = _LANG_STOPWORDS["en"]
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out_id, out_rank, out_kw = [], [], []
    for d, t in zip(ids, texts):
        toks = [
            w
            for w in TOKEN_RE.findall((t or "").lower())
            if len(w) >= _KEYWORD_MIN_LEN and w not in stop
        ]
        for rank, (w, _) in enumerate(Counter(toks).most_common(limit), start=1):
            out_id.append(d)
            out_rank.append(rank)
            out_kw.append(w)
    return pa.table(
        {
            "doc_id": pa.array(out_id, type=pa.int64()),
            "kw_rank": pa.array(out_rank, type=pa.int64()),
            "keyword": pa.array(out_kw, type=pa.string()),
        }
    )


def keywords(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(keywords_batch, batch_format="pyarrow", zero_copy_batch=True)


def keywords_exploded(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(
        keywords_exploded_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def token_counts(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(token_count_batch, batch_format="pyarrow", zero_copy_batch=True)


def quality(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(quality_batch, batch_format="pyarrow", zero_copy_batch=True)


def langid(
    docs: ray.data.Dataset, concurrency: int | tuple | None = None
) -> ray.data.Dataset:
    return _launch_stage(
        docs,
        LangId,
        concurrency=concurrency,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def fingerprints(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True)


def repetition_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition features per doc (Rae et al. 2021 §A1.1 shape).

    ``top_token_frac`` / ``top_2gram_frac``: occurrences of the most frequent
    token / word-bigram over total occurrences; ``dup_2gram_frac`` /
    ``dup_3gram_frac``: fraction of n-gram occurrences that are repeats of an
    earlier occurrence (1 - distinct/total).  Docs with zero tokens emit no
    row (the SQL oracle's group-by drops them identically); n-gram fractions
    are 0 when the doc is shorter than the n-gram.  Rounded 6dp half-up =
    DuckDB ROUND.  Linear scan, shuffle-free.
    """
    texts = batch.column("text").to_pylist()
    ids = batch.column("doc_id").to_pylist()
    out = {
        "doc_id": [],
        "top_token_frac": [],
        "top_2gram_frac": [],
        "dup_2gram_frac": [],
        "dup_3gram_frac": [],
    }
    from collections import Counter

    for doc_id, t in zip(ids, texts):
        toks = TOKEN_RE.findall((t or "").lower())
        if not toks:
            continue
        tc = Counter(toks)
        out["doc_id"].append(doc_id)
        out["top_token_frac"].append(_round6_half_up(max(tc.values()) / len(toks)))
        for n, key in ((2, "top_2gram_frac"), (3, "dup_3gram_frac")):
            grams = Counter(
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
            total = len(toks) - n + 1
            if total <= 0:
                frac = dup = 0.0
            else:
                frac = max(grams.values()) / total
                dup = (total - len(grams)) / total
            if n == 2:
                out["top_2gram_frac"].append(_round6_half_up(frac))
                out["dup_2gram_frac"].append(_round6_half_up(dup))
            else:
                out["dup_3gram_frac"].append(_round6_half_up(dup))
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
            "top_token_frac": pa.array(out["top_token_frac"], type=pa.float64()),
            "top_2gram_frac": pa.array(out["top_2gram_frac"], type=pa.float64()),
            "dup_2gram_frac": pa.array(out["dup_2gram_frac"], type=pa.float64()),
            "dup_3gram_frac": pa.array(out["dup_3gram_frac"], type=pa.float64()),
        }
    )


def repetition(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(repetition_batch, batch_format="pyarrow", zero_copy_batch=True)


def quality_filter_batch(
    batch: pa.Table,
    *,
    min_tokens: int = 25,
    max_tokens: int = 100_000,
    min_alpha_ratio: float = 0.5,
    max_top_token_frac: float = 0.20,
    max_top_2gram_frac: float = 0.20,
    max_dup_3gram_frac: float = 0.20,
) -> pa.Table:
    """C4/Gopher-style cleaning filter: keep docs passing every threshold.

    Composes the quality + repetition features in one pass — each doc is
    tokenized once and all thresholds are checked in-line — and emits only
    surviving ``doc_id`` rows: the shape a 100 TB cleaning stage needs
    (linear map, output is the keep-list to semi-join downstream).
    Repetition fractions use the same round-6-half-up values as
    ``repetition_batch``, so the SQL oracle's ROUND comparisons agree.
    """
    from collections import Counter

    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    keep: list[int] = []
    for doc_id, t in zip(ids, texts):
        t = t or ""
        toks = TOKEN_RE.findall(t.lower())
        if not (min_tokens <= len(toks) <= max_tokens):
            continue
        n_alpha = sum(ch.isalpha() for ch in t)
        if not t or n_alpha / len(t) < min_alpha_ratio:
            continue
        if _round6_half_up(max(Counter(toks).values()) / len(toks)) > max_top_token_frac:
            continue
        n2 = len(toks) - 1
        if n2 > 0:
            grams2 = Counter(
                " ".join(toks[i : i + 2]) for i in range(n2)
            )
            if _round6_half_up(max(grams2.values()) / n2) > max_top_2gram_frac:
                continue
        n3 = len(toks) - 2
        if n3 > 0:
            d3 = (n3 - len({" ".join(toks[i : i + 3]) for i in range(n3)})) / n3
            if _round6_half_up(d3) > max_dup_3gram_frac:
                continue
        keep.append(doc_id)
    return pa.table({"doc_id": pa.array(keep, type=pa.int64())})


def quality_filter(docs: ray.data.Dataset, **thresholds) -> ray.data.Dataset:
    import functools

    fn = functools.partial(quality_filter_batch, **thresholds)
    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# corpus n-gram counts (training-data LM-count shape)


def bigram_partial_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → per-batch partial (bigram, n) counts.

    Map-side combine: the shuffle moves one row per distinct bigram per
    batch, not one per occurrence — the partial+final shape of SURVEY.md
    §2.5 A6 applied to an unbounded key domain.
    """
    from collections import Counter

    counts: Counter = Counter()
    for t in batch.column("text").to_pylist():
        toks = TOKEN_RE.findall(t.lower()) if t else []
        counts.update(
            " ".join(pair) for pair in zip(toks, toks[1:])
        )
    return pa.table(
        {
            "bigram": pa.array(list(counts.keys()), type=pa.string()),
            "n": pa.array(list(counts.values()), type=pa.int64()),
        }
    )


def bigram_counts(
    docs: ray.data.Dataset, *, min_count: int = 5, n_parts: int = 64
) -> ray.data.Dataset:
    """Corpus-wide bigram count table with a frequency floor.

    Bigram cardinality grows with the corpus, so the final sum runs inside
    coarse hash partitions (``functions/groups.py``) — Ray never sees the
    bigram as a group key.  The min-count filter happens inside the
    partition, before anything is returned, so the output shrinks there too.
    """
    from .groups import coarse_grouped, str_pid

    partials = docs.map_batches(
        bigram_partial_batch, batch_format="pyarrow", zero_copy_batch=True
    )

    def final(df):
        g = df.groupby("bigram", as_index=False, sort=False)["n"].sum()
        return g[g["n"] >= min_count]

    return coarse_grouped(
        partials, lambda b: str_pid(b, "bigram", n_parts), final, n_parts=n_parts
    )


def unigram_partial_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → per-batch partial (term, n) occurrence counts plus
    one ``__n_bigrams__`` sentinel row carrying the batch's adjacent-pair
    total (needed UNFILTERED for PMI normalization — ``bigram_counts``
    drops sub-threshold pairs before they can be summed)."""
    from collections import Counter

    counts: Counter = Counter()
    n_bi = 0
    for t in batch.column("text").to_pylist():
        toks = TOKEN_RE.findall(t.lower()) if t else []
        counts.update(toks)
        n_bi += max(len(toks) - 1, 0)
    terms = list(counts.keys()) + ["__n_bigrams__"]
    ns = list(counts.values()) + [n_bi]
    return pa.table(
        {
            "term": pa.array(terms, type=pa.string()),
            "n": pa.array(ns, type=pa.int64()),
        }
    )


def pmi_bigrams(
    docs: ray.data.Dataset, *, k: int = 50, min_count: int = 5, n_parts: int = 64
) -> pa.Table:
    """Collocation extraction: top-k adjacent-token bigrams by pointwise
    mutual information, ``PMI = ln((c_ab/N_bi) / ((c_a/N_uni)(c_b/N_uni)))``,
    over bigrams with count ≥ ``min_count``; ranked (rounded PMI desc,
    bigram asc).

    Counts come from the same partial+coarse-group shape as
    ``bigram_counts`` (Ray never sees a bigram/term as a group key); the
    final PMI rank runs driver-side over the min-count-filtered bigram
    table + the vocabulary-sized unigram table — the term-dictionary size
    class.  The ln operand order mirrors the SQL twin exactly, so rounded
    PMIs are bit-stable across engines (exact-integer ratios in, one libm
    ln out — the idf precedent)."""
    import numpy as np

    from .groups import coarse_grouped, str_pid

    bi = bigram_counts(docs, min_count=min_count, n_parts=n_parts).to_pandas()

    uni_partials = docs.map_batches(
        unigram_partial_batch, batch_format="pyarrow", zero_copy_batch=True
    )

    def final(df):
        return df.groupby("term", as_index=False, sort=False)["n"].sum()

    uni = coarse_grouped(
        uni_partials, lambda b: str_pid(b, "term", n_parts), final, n_parts=n_parts
    ).to_pandas()
    n_bi = float(uni.loc[uni["term"] == "__n_bigrams__", "n"].sum())
    uni = uni[uni["term"] != "__n_bigrams__"]
    n_uni = float(uni["n"].sum())
    cmap = dict(zip(uni["term"], uni["n"].astype(float)))
    rows = []
    for bg, c_ab in zip(bi["bigram"], bi["n"].astype(float)):
        a, b = bg.split(" ", 1)
        pmi = float(
            np.log((c_ab / n_bi) / ((cmap[a] / n_uni) * (cmap[b] / n_uni)))
        )
        rows.append((bg, int(c_ab), round(pmi, 6)))
    rows.sort(key=lambda r: (-r[2], r[0]))
    rows = rows[:k]
    return pa.table(
        {
            "bigram": pa.array([r[0] for r in rows], type=pa.string()),
            "n": pa.array([r[1] for r in rows], type=pa.int64()),
            "pmi": pa.array([r[2] for r in rows], type=pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# PII scrubbing (vectorized regex redaction)

# RE2 syntax on BOTH sides: pyarrow.compute uses RE2, DuckDB regexp_* uses
# RE2 — the patterns below must stay within the common subset (no
# backreferences, no lookaround) so engine and oracle agree byte-for-byte.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_NUMBER_RE = r"[0-9]+"


def scrub_batch(batch: pa.Table) -> pa.Table:
    """Redact email-shaped spans then digit runs; count redactions.

    Pure Arrow kernels (RE2), zero Python per row — the shape a 100 TB
    scrub pass needs.
    """
    import pyarrow.compute as pc

    text = batch.column("text")
    n_email = pc.count_substring_regex(text, _EMAIL_RE)
    clean = pc.replace_substring_regex(text, _EMAIL_RE, "<EMAIL>")
    n_num = pc.count_substring_regex(clean, _NUMBER_RE)
    clean = pc.replace_substring_regex(clean, _NUMBER_RE, "<NUM>")
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "clean_text": clean,
            "n_redacted": pc.cast(pc.add(n_email, n_num), pa.int64()),
        }
    )


def scrub(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(scrub_batch, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Reference-faithful brief keywords (vexor/services/keyword_service.py:67-107)

_BRIEF_CHAR_LIMIT = 4000
_BRIEF_LIMIT = 20
_BRIEF_WORD_RE = None  # compiled lazily (module import stays light)
_BRIEF_CJK_RE = None
_BRIEF_STOP = frozenset(
    "the and for are with this that from have will should must need user "
    "users data when your their about into which within where while there "
    "only each more than also such shall can may our per any all like been "
    "over ensure including include".split()
)
_BRIEF_STOP_ZH = frozenset(
    ["的", "了", "和", "或", "及", "需要", "支持", "功能", "用户", "系统"]
)


def brief_keywords_batch(batch: pa.Table, *, limit: int = _BRIEF_LIMIT) -> pa.Table:
    """(doc_id, text) → exploded (doc_id, kw_rank, keyword).

    Bit-faithful to the reference's ``_extract_keywords``
    (``vexor/services/keyword_service.py:86-107``): word tokens
    ``[A-Za-z][A-Za-z0-9_-]+`` lowercased, len>=3, 44-word stopword set;
    CJK runs ``[\\u4e00-\\u9fff]{2,}`` minus the ZH stopword set; counts
    shared across both passes; ``Counter.most_common`` ranking with the
    insertion-order tie-break (all word keys enter before all CJK keys);
    the DISPLAY form is the first raw occurrence (case preserved).  Input
    snippet = first 4000 chars (the BRIEF_CHAR_LIMIT head cap).
    """
    import re
    from collections import Counter

    global _BRIEF_WORD_RE, _BRIEF_CJK_RE
    if _BRIEF_WORD_RE is None:
        _BRIEF_WORD_RE = re.compile(r"[A-Za-z][A-Za-z0-9_-]+")
        _BRIEF_CJK_RE = re.compile("[一-鿿]{2,}")

    out_id, out_rank, out_kw = [], [], []
    for d, t in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        snippet = (t or "")[:_BRIEF_CHAR_LIMIT]
        display: dict[str, str] = {}
        counter: Counter = Counter()
        for m in _BRIEF_WORD_RE.finditer(snippet):
            raw = m.group(0)
            key = raw.lower()
            if len(key) < 3 or key in _BRIEF_STOP:
                continue
            counter[key] += 1
            display.setdefault(key, raw)
        for m in _BRIEF_CJK_RE.finditer(snippet):
            token = m.group(0)
            if token in _BRIEF_STOP_ZH:
                continue
            counter[token] += 1
            display.setdefault(token, token)
        for rank, (key, _c) in enumerate(counter.most_common(limit), start=1):
            out_id.append(d)
            out_rank.append(rank)
            out_kw.append(display[key])
    return pa.table(
        {
            "doc_id": pa.array(out_id, type=pa.int64()),
            "kw_rank": pa.array(out_rank, type=pa.int64()),
            "keyword": pa.array(out_kw, type=pa.string()),
        }
    )


def brief_keywords(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(
        brief_keywords_batch, batch_format="pyarrow", zero_copy_batch=True
    )
