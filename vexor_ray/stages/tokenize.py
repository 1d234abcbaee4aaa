"""Tokenize stage: ``(url, text) → (url, doc_len, terms, tfs)``.

A stateful actor-pool ``map_batches`` class: the tokenizer (compiled regex,
optionally a pluggable pre-tokenizer) and per-actor metrics counters are
built once in ``__init__`` and reused across batches.  The lexical document
is ``f"{url} {text}"`` (url + extracted text — the analogue of the
reference's ``rel_path + label`` document construction) unless
``text_only=True`` (bare corpora like the ``documents`` table).

Output schema: ``url:string, doc_len:uint32, terms:list<string>,
tfs:list<uint32>`` — the tokenized-docs checkpoint that both the corpus
stats aggregate and the posting explode read, so tokenization runs exactly
once per document.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from ..spec import TOKEN_PATTERN


class TokenizeDocs:
    """Actor-pool callable: tokenize + per-doc term frequencies."""

    def __init__(self, text_only: bool = False, token_pattern: str = TOKEN_PATTERN):
        import re

        self._re = re.compile(token_pattern)
        self._text_only = text_only
        # per-actor metrics (exposed in logs; stage-level metrics are
        # aggregated from dataset counts in the manifest)
        self.n_docs = 0
        self.n_tokens = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        findall = self._re.findall
        doc_lens: list[int] = []
        terms_col: list[list[str]] = []
        tfs_col: list[list[int]] = []
        if self._text_only:
            docs = texts
        else:
            docs = [f"{u} {t}" for u, t in zip(urls, texts)]
        for doc in docs:
            tokens = findall(doc.lower())
            counts = Counter(tokens)
            doc_lens.append(len(tokens))
            terms_col.append(list(counts.keys()))
            tfs_col.append(list(counts.values()))
        self.n_docs += len(docs)
        self.n_tokens += sum(doc_lens)
        cols = {
            "url": pa.array(urls, type=pa.string()),
            "doc_len": pa.array(doc_lens, type=pa.uint32()),
            "terms": pa.array(terms_col, type=pa.list_(pa.string())),
            "tfs": pa.array(tfs_col, type=pa.list_(pa.uint32())),
        }
        if "doc_id" in batch.column_names:
            cols = {"doc_id": batch.column("doc_id"), **cols}
        return pa.table(cols)
