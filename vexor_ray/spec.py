"""The semantic contract: every constant the rank-identity guarantee depends on.

These values mirror the reference engine's scoring semantics (see SURVEY.md
"Semantics that gate rank-identity"):

- BM25 constants: reference ``vexor/bm25.py:13-14``.
- Tokenizer regex path: reference ``vexor/bm25.py:21,35-36`` (the HuggingFace
  Bert pre-tokenizer path is an optional plug-in; the deterministic default is
  the regex path, which is also what the reference does when ``tokenizers``
  is not installed).
- Query-term cap: reference ``vexor/bm25.py:19``.
- Text normalization caps: reference
  ``vexor/services/content_extract_service.py:13-17``.
- RRF fusion constants: reference ``vexor/bm25.py:15-18``.

Engine code (Ray side) and the pure-Python oracle (``vexor_ray.refimpl``)
both import from here — there is exactly one source of truth.
"""

from __future__ import annotations

import re

# --- BM25 scoring ----------------------------------------------------------
BM25_K1: float = 1.5
BM25_B: float = 0.75
MAX_QUERY_TERMS: int = 32

# --- RRF hybrid fusion -----------------------------------------------------
RRF_K: int = 60
RRF_DENSE_WEIGHT: float = 0.7
RRF_BM25_WEIGHT: float = 0.3

# --- Tokenizer (regex path) ------------------------------------------------
TOKEN_PATTERN: str = r"[A-Za-z0-9_]+"
TOKEN_RE = re.compile(TOKEN_PATTERN)

# --- Text extraction / normalization ---------------------------------------
FULL_CHAR_LIMIT: int = 200_000
HEAD_CHAR_LIMIT: int = 1_000
UTF8_BYTE_MULTIPLIER: int = 4
DEFAULT_CHUNK_SIZE: int = 1_000
DEFAULT_CHUNK_OVERLAP: int = 100

# --- Index layout ----------------------------------------------------------
# Postings are encoded in fixed-size blocks; each block carries a skip entry
# (last docID) and an idf-free block-max upper bound for WAND pruning.
POSTING_BLOCK_SIZE: int = 128

# Doc-range salt: shuffle key for the posting build is (term, doc_id >> SALT_SHIFT)
# so a Zipfian hot term splits into bounded doc-range subgroups.  2**20 docs per
# range bounds any group to ~1M postings (~16 MB of raw arrays) regardless of
# term skew; at sandbox scale every salt is 0 and the key degenerates to `term`.
DEFAULT_SALT_SHIFT: int = 20

# Term-hash waves: stage 2 (shuffle + segment write) runs as W independent
# term-hash buckets so a killed build resumes at wave granularity.
DEFAULT_NUM_WAVES: int = 4

# Exact-scorer memory ceiling: above this many docs in one index, the exact
# path scores per SALT-RANGE SHARD (consecutive-salt spans of at most this
# many docs) in shard-local dense coordinates instead of materializing one
# doc_count-length docID index + score vector per query.  Keeps a single
# searcher's peak scoring memory independent of corpus size (16M docs ≈
# 128 MB ids + 128 MB scores per shard) while staying bit-identical — per-doc
# contributions still accumulate term-by-term in query order.
DEFAULT_MAX_DENSE_DOCS: int = 16_000_000

INDEX_FORMAT_VERSION: int = 2
