"""BPE tokenizer induction (``functions/bpe.py``) vs naive references.

The trainer's incremental pair bookkeeping is pinned against a from-scratch
recount-every-iteration implementation of the published algorithm; the
greedy lowest-rank encoder is pinned against sequential merge application
(the two standard formulations must agree)."""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pytest

from vexor_ray.functions.bpe import (
    END,
    BpeEncoder,
    bpe_encode,
    bpe_train,
    bpe_train_from_freqs,
    encode_word,
)
from vexor_ray.spec import TOKEN_RE


def naive_bpe_train(freqs: dict[str, int], n_merges: int, min_pair: int = 2):
    """Recount-from-scratch reference (Sennrich et al. pseudocode shape)."""
    words = {w: list(w) + [END] for w in freqs}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, syms in words.items():
            for pair in zip(syms, syms[1:]):
                pc[pair] += freqs[w]
        cand = [(c, p) for p, c in pc.items() if c >= min_pair]
        if not cand:
            break
        best = min(cand, key=lambda cp: (-cp[0], cp[1]))[1]
        merges.append(best)
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def naive_encode(word: str, merges) -> list[str]:
    """Sequential merge application in rank order — must equal the greedy
    lowest-rank-first encoder."""
    syms = list(word) + [END]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


FREQS = {
    "lower": 5, "lowest": 3, "newer": 6, "wider": 3, "new": 2,
    "low": 7, "newest": 4, "widest": 1, "wide": 2, "er": 1,
}


@pytest.mark.parametrize("n_merges", [1, 5, 20, 100])
def test_trainer_matches_naive_reference(n_merges):
    assert bpe_train_from_freqs(FREQS, n_merges) == naive_bpe_train(
        FREQS, n_merges
    )


def test_encoder_matches_sequential_application():
    merges = bpe_train_from_freqs(FREQS, 30)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in list(FREQS) + ["unseenword", "l", "lowering", "z"]:
        assert encode_word(w, ranks) == naive_encode(w, merges), w


def test_encode_concat_roundtrip():
    merges = bpe_train_from_freqs(FREQS, 30)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in FREQS:
        assert "".join(encode_word(w, ranks)) == w + END


def test_distributed_train_and_encode(ray_session):
    """bpe_train over a Ray dataset == the merge loop over exact
    python-side word counts; the encode stage agrees per document."""
    import ray.data

    texts = [
        "the lower newer table joins the wider newest table",
        "lowest wider tables join lower and newer rows",
        "new low wide er lowest newest the the the",
    ] * 5
    docs = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )
    freqs: Counter = Counter()
    for t in texts:
        freqs.update(TOKEN_RE.findall(t.lower()))
    merges = bpe_train(docs, n_merges=40)
    assert merges == bpe_train_from_freqs(dict(freqs), 40)

    enc = bpe_encode(docs, merges, concurrency=2).to_pandas()
    enc = enc.sort_values("doc_id")
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for i, t in enumerate(texts):
        want = []
        for w in TOKEN_RE.findall(t.lower()):
            want.extend(encode_word(w, ranks))
        row = enc[enc.doc_id == i].iloc[0]
        assert list(row["bpe_tokens"]) == want
        assert row["n_bpe_tokens"] == len(want)


def test_bpe_index_rank_identity_vs_oracle(ray_session, pages_1k, tmp_path):
    """A full index built with tokenizer='bpe' (learned merges in the
    manifest) is rank- and score-identical to the pure-python oracle
    tokenizing with the same merges — the Tokenizer plug-in seam carrying a
    LEARNED tokenizer end-to-end (build, manifest, query preprocessing)."""
    import math

    import ray.data

    from vexor_ray.fixtures.pages import generate_queries
    from vexor_ray.index.build import BuildConfig, build_index
    from vexor_ray.query.searcher import Searcher
    from vexor_ray.refimpl import textnorm
    from vexor_ray.refimpl.oracle import build_oracle_index
    from vexor_ray.refimpl.oracle import search as oracle_search

    docs = ray.data.read_parquet(str(pages_1k), columns=["url", "html"])

    def to_text(batch):
        texts = [
            textnorm.extract_text(h, 200_000) or ""
            for h in batch.column("html").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(
                    [f"{u} {t}" for u, t in zip(batch.column("url").to_pylist(), texts)]
                ),
            }
        )

    merges = bpe_train(
        docs.map_batches(to_text, batch_format="pyarrow"), n_merges=120
    )
    assert len(merges) > 50

    idx = tmp_path / "bpe_idx"
    cfg = BuildConfig(
        tokenizer="bpe",
        bpe_merges=[list(p) for p in merges],
        num_waves=2,
        partitions_per_wave=2,
        shard_group_size=2,
        tokenize_concurrency=2,
        salt_shift=8,
    )
    build_index(pages_1k, idx, cfg)
    s = Searcher(idx)

    import pyarrow.parquet as pq

    rows = []
    for f in sorted(pages_1k.glob("*.parquet")):
        t = pq.read_table(f, columns=["url", "html"])
        rows.extend(zip(t["url"].to_pylist(), t["html"].to_pylist()))
    oracle = build_oracle_index(
        rows,
        ids=sorted(
            s._docs_ds.to_table(columns=["doc_id"]).column("doc_id").to_pylist()
        ),
        tokenizer="bpe",
        bpe_merges=merges,
    )
    assert s.doc_count == oracle.doc_count
    assert math.isclose(s.avg_doc_len, oracle.avg_doc_len, rel_tol=1e-12)
    for q in [r["query"] for r in generate_queries(20, seed=4)]:
        got = s.search(q, k=20)
        want = oracle_search(oracle, q, k=20, tokenizer="bpe", bpe_merges=merges)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, es) in zip(got, want):
            assert math.isclose(gs, es, rel_tol=1e-9)
