"""Bert-pre-tokenizer ∪ regex-whole-token path — the reference's two-path
tokenizer (``vexor/bm25.py:24-51``), re-implemented from scratch.

The reference delegates to HuggingFace ``tokenizers.pre_tokenizers.
BertPreTokenizer`` when importable and falls back to the plain regex path
otherwise.  The Bert pre-tokenization ALGORITHM is public and tiny: split on
whitespace, then isolate every punctuation character as its own token
(punctuation = ASCII blocks 33-47 / 58-64 / 91-96 / 123-126 plus any Unicode
``P*`` category).  ``bert_pre_tokenize`` implements exactly that, so the
union path works — and stays deterministic — without the package; when
``tokenizers`` IS importable a parity test pins our implementation to it
(``tests/test_berttok.py``).

Union semantics (reference ``bm25.py:37-51``): pre-tokenize, strip, keep
tokens containing any alphanumeric, lowercase; then append each lowercased
regex whole-token (``[A-Za-z0-9_]+``) not already present in the sub-token
set — so ``snake_case_name`` is indexed both split and whole.
"""

from __future__ import annotations

import unicodedata

from ..spec import TOKEN_RE


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (
        (33 <= cp <= 47)
        or (58 <= cp <= 64)
        or (91 <= cp <= 96)
        or (123 <= cp <= 126)
    ):
        return True
    return unicodedata.category(ch).startswith("P")


def bert_pre_tokenize(text: str) -> list[str]:
    """Whitespace split + punctuation isolation (BertPreTokenizer algorithm)."""
    out: list[str] = []
    word: list[str] = []
    for ch in text:
        if ch.isspace():
            if word:
                out.append("".join(word))
                word = []
        elif _is_punctuation(ch):
            if word:
                out.append("".join(word))
                word = []
            out.append(ch)
        else:
            word.append(ch)
    if word:
        out.append("".join(word))
    return out


def tokenize_bert_union(text: str) -> list[str]:
    """Bert sub-tokens ∪ regex whole-tokens (reference ``bm25.py:37-51``)."""
    normalized: list[str] = []
    for token in bert_pre_tokenize(text):
        cleaned = token.strip()
        if not cleaned:
            continue
        if any(ch.isalnum() for ch in cleaned):
            normalized.append(cleaned.lower())
    sub_tokens = set(normalized)
    normalized.extend(
        whole_token
        for whole_token in TOKEN_RE.findall(text.lower())
        if whole_token not in sub_tokens
    )
    return normalized


TOKENIZERS = ("regex", "bert_union", "bpe")


def make_tokenizer(
    name: str, token_pattern: str | None = None, *, bpe_merges=None,
    stop_words=None,
):
    """Tokenizer factory for the build/query stages.

    ``regex``: ``pattern.findall(text.lower())`` (the deterministic default);
    ``bert_union``: the reference's two-path union above;
    ``bpe``: regex words re-segmented into learned subword units
    (``functions/bpe.py`` — pass the merge list via ``bpe_merges``; the
    manifest carries it so query tokenization always matches the build).

    ``stop_words``: analyzer-chain stopword filter applied AFTER the base
    tokenizer — dropped at index time and at query time alike (both sides
    construct their tokenizer from the same manifest config, so parity is
    structural).  Doc lengths, stats, and scoring all see the filtered
    stream, exactly as if the corpus never contained those words.
    """
    base = _make_base_tokenizer(name, token_pattern, bpe_merges=bpe_merges)
    if not stop_words:
        return base
    stops = frozenset(stop_words)

    def _stopped(text: str) -> list[str]:
        return [t for t in base(text) if t not in stops]

    return _stopped


def _make_base_tokenizer(
    name: str, token_pattern: str | None = None, *, bpe_merges=None
):
    if name == "bert_union":
        return tokenize_bert_union
    if name == "bpe":
        if not bpe_merges:
            raise ValueError("tokenizer='bpe' requires a bpe_merges list")
        import re

        from ..functions.bpe import encode_word
        from ..spec import TOKEN_PATTERN

        rx = re.compile(token_pattern or TOKEN_PATTERN)
        ranks = {tuple(p): i for i, p in enumerate(bpe_merges)}
        cache: dict[str, list[str]] = {}

        def _bpe_tokenize(text: str) -> list[str]:
            out: list[str] = []
            for w in rx.findall(text.lower()):
                enc = cache.get(w)
                if enc is None:
                    enc = encode_word(w, ranks)
                    cache[w] = enc
                out.extend(enc)
            return out

        return _bpe_tokenize
    if name == "regex":
        import re

        from ..spec import TOKEN_PATTERN

        rx = re.compile(token_pattern or TOKEN_PATTERN)

        def _regex_tokenize(text: str) -> list[str]:
            return rx.findall(text.lower())

        return _regex_tokenize
    raise ValueError(f"unknown tokenizer {name!r} (expected one of {TOKENIZERS})")
