"""Single-process end-to-end oracle: pages table → index → BM25 top-k.

This is the slow, obviously-correct implementation the Ray engine is tested
against for rank-identity.  Pipeline semantics (pinned here AND in the Ray
engine — see FIXTURES.md):

1. extract: ``text = extract_text(html)`` (byte-identical contract); pages
   whose extraction yields ``None`` are dropped (their docID is never used).
2. docID: assigned from input lineage BEFORE extraction — by default the
   page's position in input order; the Ray engine uses
   ``(file_idx << 32) | row_in_file`` over the sorted input file list
   (``stages/docids.py``), which a test replicates by passing explicit
   ``ids``.  Both are deterministic total orders in input order — the
   analogue of the reference's sorted-file-walk + position ordering
   (``utils.py:362``, ``cache.py:604-633``) — and give the
   (score desc, docID asc) tie-break a stable meaning.
3. document: ``f"{url} {text}"``; ``doc_len`` = token count of the document.
4. score: ``score_postings`` with the spec constants; top-k by
   (score desc, docID asc).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..spec import FULL_CHAR_LIMIT
from . import bm25, textnorm


@dataclass
class OracleIndex:
    doc_count: int = 0
    avg_doc_len: float = 0.0
    urls: dict[int, str] = field(default_factory=dict)  # doc_id -> url
    doc_lens: dict[int, int] = field(default_factory=dict)  # doc_id -> tokens
    postings: dict[str, list[tuple[int, int, int]]] = field(default_factory=dict)
    # term -> [(doc_id, tf, doc_len)] with doc_id ascending

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))


def build_oracle_index(
    pages: list[tuple[str, bytes | None]] | list[tuple[str, bytes | None, str | None]],
    char_limit: int = FULL_CHAR_LIMIT,
    text_only: bool = False,
    ids: list[int] | None = None,
    doc_builder: str = "url_text",
    tokenizer: str = "regex",
    bpe_merges: list | None = None,
) -> OracleIndex:
    """Index a list of ``(url, html)`` pairs (or ``(key, None, text)`` rows).

    ``ids`` gives each input row its docID (must be strictly ascending in
    input order — the engine's lineage IDs are); default = input position.
    ``text_only=True`` indexes pre-extracted text documents where the lexical
    document is the text alone (used for the ``documents`` corpus); otherwise
    the document is ``f"{url} {extracted_text}"``.
    """
    if ids is None:
        ids = list(range(len(pages)))
    if any(b > a for a, b in zip(ids[1:], ids)):
        raise ValueError("ids must be ascending in input order")
    index = OracleIndex()
    total_len = 0
    n_docs = 0
    for doc_id, row in zip(ids, pages):
        if len(row) == 3 and row[1] is None:
            url, _, text = row  # pre-extracted text path
            if text is None:
                continue
            text = textnorm.normalize_text(text)
            if not text:
                continue
        else:
            url, html = row[0], row[1]
            text = textnorm.extract_text(html, char_limit)
            if text is None:
                continue
        builder = "text" if text_only else doc_builder
        if builder == "text":
            document = text
        elif builder == "head":
            document = bm25.build_document(url, textnorm.head_snippet(text) or "")
        else:
            document = bm25.build_document(url, text)
        tokens = _tokenize_fn(tokenizer, bpe_merges)(document)
        tfs = bm25.term_frequencies(tokens)
        doc_len = len(tokens)
        index.urls[doc_id] = url
        index.doc_lens[doc_id] = doc_len
        total_len += doc_len
        n_docs += 1
        for term, tf in tfs.items():
            index.postings.setdefault(term, []).append((doc_id, tf, doc_len))
    index.doc_count = n_docs
    index.avg_doc_len = total_len / n_docs if n_docs else 0.0
    return index


def _tokenize_fn(tokenizer: str, bpe_merges=None):
    """Tokenizer routing for the oracle (same factory as the engine)."""
    from ..stages.berttok import make_tokenizer

    return make_tokenizer(tokenizer, bpe_merges=bpe_merges)


def search(
    index: OracleIndex,
    query: str,
    k: int = 10,
    tokenizer: str = "regex",
    bpe_merges: list | None = None,
) -> list[tuple[int, float]]:
    """BM25 top-k over the oracle index: [(doc_id, score)] ranked."""
    from ..spec import MAX_QUERY_TERMS

    terms = list(
        dict.fromkeys(_tokenize_fn(tokenizer, bpe_merges)(query))
    )[:MAX_QUERY_TERMS]
    if not terms:
        return []
    scores = bm25.score_postings(
        terms, index.postings, index.doc_count, index.avg_doc_len
    )
    return bm25.top_k(scores, k)
