"""Byte-pair-encoding tokenizer induction over a Ray Data corpus.

Classic BPE (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of
Rare Words with Subword Units" — public literature): start from characters,
repeatedly merge the most frequent adjacent symbol pair.  The scalable
shape is the one production trainers use: the CORPUS is touched exactly
once (a distributed word-frequency count — words repeat Zipf-style, so the
merge loop runs over the vocabulary-sized word→freq table driver-side, not
over the corpus), and encoding is a stateless actor-pool stage holding the
learned merge ranks.

Determinism: merge selection ties break by (count desc, pair asc), word
iteration is sorted, so the merge list is a pure function of the corpus —
pinned against a from-scratch naive reference in ``tests/test_bpe.py``.

The reference engine has no tokenizer induction (its tokenizer is a fixed
regex / Bert pre-tokenizer, ``vexor/bm25.py:24-51``); this is
training-data-pipeline surface: learning the vocabulary IS a corpus job.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..spec import TOKEN_RE

END = "▁"  # end-of-word sentinel symbol (never produced by TOKEN_RE)


def word_freq_partial_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → per-batch partial (word, n) counts (map-side
    combine: one row per distinct word per batch)."""
    from collections import Counter

    counts: Counter = Counter()
    for t in batch.column("text").to_pylist():
        counts.update(TOKEN_RE.findall(t.lower()) if t else [])
    return pa.table(
        {
            "word": pa.array(list(counts.keys()), type=pa.string()),
            "n": pa.array(list(counts.values()), type=pa.int64()),
        }
    )


def word_frequencies(docs: ray.data.Dataset, n_parts: int = 64):
    """Corpus word→frequency table (one distributed pass, coarse-grouped;
    vocabulary-sized output)."""
    from .groups import coarse_grouped, str_pid

    partials = docs.map_batches(
        word_freq_partial_batch, batch_format="pyarrow", zero_copy_batch=True
    )

    def final(df):
        return df.groupby("word", as_index=False, sort=False)["n"].sum()

    return coarse_grouped(
        partials, lambda b: str_pid(b, "word", n_parts), final, n_parts=n_parts
    ).to_pandas()


def bpe_train_from_freqs(
    freqs: dict[str, int], n_merges: int, min_pair_count: int = 2
) -> list[tuple[str, str]]:
    """The merge loop over a word→freq table (driver-side, vocab-scale).

    Each word is a symbol sequence ``chars + [END]``; every iteration
    counts adjacent symbol pairs weighted by word frequency, merges the
    most frequent pair (ties: count desc, pair asc), and rewrites only the
    words containing it.  Stops early when no pair reaches
    ``min_pair_count``.
    """
    from collections import Counter

    words: list[tuple[list[str], int]] = [
        (list(w) + [END], n) for w, n in sorted(freqs.items())
    ]
    # pair → total count, and pair → set of word indexes containing it so a
    # merge rewrites only affected words (classic trainer bookkeeping)
    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, n) in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += n
            pair_words.setdefault((a, b), set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        for pair, c in pair_counts.items():
            if c < min_pair_count:
                continue
            key = (-c, pair)
            if best is None or key < best[0]:
                best = (key, pair)
        if best is None:
            break
        pair = best[1]
        merges.append(pair)
        merged = pair[0] + pair[1]
        for wi in sorted(pair_words.get(pair, ())):
            syms, n = words[wi]
            # remove this word's old pair contributions, apply the merge,
            # add the new ones
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= n
                ws = pair_words.get((a, b))
                if ws is not None:
                    ws.discard(wi)
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == pair[0]
                    and syms[i + 1] == pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = (out, n)
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] += n
                pair_words.setdefault((a, b), set()).add(wi)
        pair_counts.pop(pair, None)
        pair_words.pop(pair, None)
    return merges


def bpe_train(
    docs: ray.data.Dataset,
    n_merges: int = 200,
    *,
    min_pair_count: int = 2,
    n_parts: int = 64,
) -> list[tuple[str, str]]:
    """Learn a BPE merge list from a corpus: one distributed word-count
    pass, then the driver-side merge loop (see module docstring)."""
    wf = word_frequencies(docs, n_parts=n_parts)
    return bpe_train_from_freqs(
        dict(zip(wf["word"], wf["n"].astype(int))),
        n_merges,
        min_pair_count,
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word (lowest-rank pair first — the
    standard greedy BPE encode order, deterministic)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeEncoder:
    """Actor-pool encode stage: merge ranks built once per actor, per-word
    encode results memoized (Zipfian words repeat)."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self._cache: dict[str, list[str]] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        out: list[list[str]] = []
        for t in batch.column("text").to_pylist():
            toks: list[str] = []
            for w in TOKEN_RE.findall(t.lower()) if t else []:
                enc = self._cache.get(w)
                if enc is None:
                    enc = encode_word(w, self.ranks)
                    self._cache[w] = enc
                toks.extend(enc)
            out.append(toks)
        return pa.table(
            {
                "doc_id": ids,
                "bpe_tokens": pa.array(out, type=pa.list_(pa.string())),
                "n_bpe_tokens": pa.array(
                    [len(x) for x in out], type=pa.int64()
                ),
            }
        )


def bpe_encode(
    docs: ray.data.Dataset,
    merges: list[tuple[str, str]],
    *,
    concurrency: int | None = None,
    batch_size: int = 256,
) -> ray.data.Dataset:
    """Encode a corpus with a learned merge list.

    Default (``concurrency=None``) ships a pre-built encoder instance as
    plain elastic tasks (``functions/_pool.py`` discipline — the merge
    table is small picklable state).  An explicit pool size is CLAMPED to
    ``session_cpus - 1``: a pool that reserves every CPU starves its own
    upstream read and deadlocks the pipeline (hit in a 4-CPU test session
    with the old fixed default of 4 — the pool held all four CPUs while
    ReadParquet waited forever for one).
    """
    from ._pool import launch_stage

    if concurrency is not None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", concurrency + 1))
        except Exception:
            cpus = concurrency + 1
        concurrency = max(1, min(concurrency, cpus - 1))
    return launch_stage(
        docs,
        BpeEncoder,
        {"merges": merges},
        concurrency=concurrency,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
