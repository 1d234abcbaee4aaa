"""Unit tests for the round-2 late additions: HLL sketch, session windows,
grouped top-k, exact distributed quantiles, bigram counts, PII scrub."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# ---------------------------------------------------------------------------
# HLL


def test_bitlen_u64_exact_at_boundaries():
    from vexor_ray.functions.sketch import _bitlen_u64

    vals = [0, 1, 2, 3, 4, (1 << 53) - 1, 1 << 53, (1 << 56) - 1, 1 << 56,
            (1 << 63) - 1, 2**64 - 1]
    got = _bitlen_u64(np.array(vals, dtype=np.uint64))
    assert got.tolist() == [v.bit_length() for v in vals]


def test_hll_registers_merge_is_max():
    from vexor_ray.functions.sketch import hll_partial_batch, merge_registers

    t1 = pa.table({"doc_id": [1], "text": ["alpha beta gamma"]})
    t2 = pa.table({"doc_id": [2], "text": ["alpha delta epsilon"]})
    both = pa.table({"doc_id": [1, 2],
                     "text": ["alpha beta gamma", "alpha delta epsilon"]})
    merged = merge_registers(
        pa.concat_tables([hll_partial_batch(t1), hll_partial_batch(t2)])
    )
    direct = merge_registers(hll_partial_batch(both))
    assert (merged == direct).all()


def test_hll_estimate_accuracy():
    from vexor_ray.functions.sketch import (
        estimate_from_registers,
        hll_partial_batch,
        merge_registers,
    )

    # 10_000 distinct tokens -> estimate within the ~1.04/sqrt(256) = 6.5%
    # standard error (allow 3 sigma)
    toks = " ".join(f"tok{i}" for i in range(10_000))
    t = pa.table({"doc_id": [1], "text": [toks]})
    est, v, _ = estimate_from_registers(merge_registers(hll_partial_batch(t)))
    assert abs(est - 10_000) / 10_000 < 0.2
    assert v == 0  # all 256 buckets hit at 10k distinct


def test_hll_distinct_tokens_dataset(ray_session):
    import ray.data

    from vexor_ray.functions.sketch import hll_distinct_tokens

    docs = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2, 3],
                  "text": ["a b c", "c d", ""]})
    )
    out = hll_distinct_tokens(docs).to_pydict()
    # 4 distinct tokens; at tiny cardinality linear counting is near-exact
    assert out["n_distinct_est"][0] == 4


# ---------------------------------------------------------------------------
# session windows


def test_events_session_agg_gap_semantics(ray_session, tmp_path, monkeypatch):
    ts = pd.to_datetime(
        [
            "2024-01-01 10:00:00",  # u1 session 1
            "2024-01-01 10:10:00",  # u1 session 1 (10 min gap)
            "2024-01-01 11:00:00",  # u1 session 2 (50 min gap)
            "2024-01-01 10:05:00",  # u2 session 1
        ]
    )
    df = pd.DataFrame(
        {"event_id": [1, 2, 3, 4], "ts": ts,
         "user_id": [1, 1, 1, 2], "event_type": ["x"] * 4,
         "value": [1.0, 2.0, 4.0, 8.0], "props": [""] * 4}
    )
    df.to_parquet(tmp_path / "events.parquet")
    from vexor_ray.pipelines.relational import events_session_agg

    out = events_session_agg(str(tmp_path)).to_pandas()
    assert len(out) == 3
    u1 = out[out["user_id"] == 1].sort_values("session_start")
    assert u1["n_events"].tolist() == [2, 1]
    assert u1["sum_value"].tolist() == [3.0, 4.0]


# ---------------------------------------------------------------------------
# grouped top-k


def test_top_docs_per_lang_ties(ray_session, tmp_path):
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["x"] * 5,
            "lang": ["en", "en", "en", "en", "de"],
            "source": ["s"] * 5,
            "n_chars": [10, 10, 10, 5, 7],
        }
    )
    df.to_parquet(tmp_path / "documents.parquet")
    from vexor_ray.pipelines.relational import top_docs_per_lang

    out = top_docs_per_lang(str(tmp_path), k=3).to_pandas()
    en = out[out["lang"] == "en"]
    # ties on n_chars resolve doc_id asc; doc 4 (n_chars 5) is cut
    assert en["doc_id"].tolist() == [1, 2, 3]
    assert en["rank"].tolist() == [1, 2, 3]
    assert out[out["lang"] == "de"]["doc_id"].tolist() == [5]


# ---------------------------------------------------------------------------
# exact quantiles


def test_price_quantiles_match_numpy(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    v = rng.uniform(10.0, 5000.0, size=10_001)
    pd.DataFrame(
        {"l_orderkey": np.arange(len(v)), "l_extendedprice": v}
    ).to_parquet(tmp_path / "lineitem.parquet")
    from vexor_ray.pipelines.relational import price_quantiles

    out = price_quantiles(str(tmp_path)).to_pandas()
    sv = np.sort(v)
    for q, val in zip(out["q"], out["value"]):
        assert val == sv[int(np.floor(q * (len(v) - 1)))]


# ---------------------------------------------------------------------------
# bigram counts


def test_bigram_counts_threshold(ray_session):
    import ray.data

    from vexor_ray.functions.textstats import bigram_counts

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2],
                "text": ["the cat sat; the cat ran", "the cat naps"],
            }
        )
    )
    out = bigram_counts(docs, min_count=3).to_pandas()
    assert out.set_index("bigram")["n"].to_dict() == {"the cat": 3}


# ---------------------------------------------------------------------------
# PII scrub


def test_scrub_batch_redacts_and_counts():
    from vexor_ray.functions.textstats import scrub_batch

    t = pa.table(
        {
            "doc_id": [1, 2],
            "text": ["mail bob.smith+x@corp.example.com now", "pin 1234 and 5"],
        }
    )
    out = scrub_batch(t).to_pydict()
    assert out["clean_text"] == ["mail <EMAIL> now", "pin <NUM> and <NUM>"]
    assert out["n_redacted"] == [1, 2]


# ---------------------------------------------------------------------------
# count-min sketch


def test_cms_upper_bound_and_exactness_when_sparse(ray_session):
    import ray.data

    from vexor_ray.functions.sketch import cms_token_counts

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2],
                "text": ["the the the cat", "the dog in a hat"],
            }
        )
    )
    out = cms_token_counts(docs, probes=("the", "cat", "absent")).to_pandas()
    got = dict(zip(out["token"], out["est_count"]))
    # few distinct tokens -> no collisions: estimates are exact; CMS never
    # under-counts, and an absent token estimates 0 here
    assert got["the"] == 4
    assert got["cat"] == 1
    assert got["absent"] == 0


def test_cms_partials_merge_additively():
    from vexor_ray.functions.sketch import cms_partial_batch

    t1 = pa.table({"doc_id": [1], "text": ["x y x"]})
    t2 = pa.table({"doc_id": [2], "text": ["x z"]})
    both = pa.table({"doc_id": [1, 2], "text": ["x y x", "x z"]})
    import pandas as pd

    merged = (
        pa.concat_tables([cms_partial_batch(t1), cms_partial_batch(t2)])
        .to_pandas()
        .groupby(["row", "cell"], as_index=False)["cnt"]
        .sum()
    )
    direct = cms_partial_batch(both).to_pandas()
    pd.testing.assert_frame_equal(
        merged.sort_values(["row", "cell"]).reset_index(drop=True),
        direct.sort_values(["row", "cell"]).reset_index(drop=True),
    )


# ---------------------------------------------------------------------------
# substring-level dedup stats


def test_substring_dup_stats_hand_corpus(ray_session):
    import ray.data

    from vexor_ray.functions.dedup import substring_dup_stats

    base = "a b c d e f g h"  # 8 tokens = exactly one window
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    base + " i",        # windows: a..h, b..i
                    base + " x",        # windows: a..h, b..x
                    "too short",        # < 8 tokens -> no row
                    base + " " + base,  # 9 windows; a..h occurs at i=0 and i=8
                ],
            }
        )
    )
    out = (
        substring_dup_stats(docs, window=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.index.tolist() == [1, 2, 4]  # doc 3 emits nothing
    # window "a b c d e f g h" occurs 4x corpus-wide (docs 1, 2, 4, 4)
    assert out.loc[1, "n_windows"] == 2 and out.loc[1, "n_dup_windows"] == 1
    assert out.loc[1, "dup_frac"] == 0.5
    assert out.loc[2, "n_windows"] == 2 and out.loc[2, "n_dup_windows"] == 1
    # doc 4: 16 tokens -> 9 windows; only the two aligned repeats of the
    # base window are duplicated (within-doc repeats count)
    assert out.loc[4, "n_windows"] == 9 and out.loc[4, "n_dup_windows"] == 2
    assert out.loc[4, "dup_frac"] == round(2 / 9, 6)


def test_substring_dup_stats_no_dups(ray_session):
    import ray.data

    from vexor_ray.functions.dedup import substring_dup_stats

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [1],
                "text": ["one two three four five six seven eight nine"],
            }
        )
    )
    out = substring_dup_stats(docs, window=8).to_pandas()
    assert out["n_dup_windows"].tolist() == [0]
    assert out["dup_frac"].tolist() == [0.0]


# ---------------------------------------------------------------------------
# stratified sampling / source stats / anti-join


def test_stratified_sample_rates(ray_session, tmp_path):
    from vexor_ray.functions.dedup import md5_u64
    from vexor_ray.pipelines.relational import stratified_sample_documents

    n = 400
    df = pd.DataFrame(
        {
            "doc_id": range(n),
            "lang": ["en", "de", "zh", "xx"] * (n // 4),
        }
    )
    df.to_parquet(tmp_path / "documents.parquet")
    out = stratified_sample_documents(str(tmp_path)).to_pandas()
    # exact membership: md5 bucket < per-stratum rate (default 50 for xx)
    rates = {"en": 5, "de": 10, "zh": 20, "xx": 50}
    expect = {
        d
        for d, lg in zip(df["doc_id"], df["lang"])
        if md5_u64(str(d).encode()) % 100 < rates[lg]
    }
    assert set(out["doc_id"].tolist()) == expect
    # strata keep-rates differ (the point of stratification)
    got = out.groupby("lang").size()
    assert got.get("en", 0) < got.get("zh", 0) < got.get("xx", 0)


def test_source_stats_exact(ray_session, tmp_path):
    from vexor_ray.pipelines.relational import source_stats

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["x"] * 4,
            "lang": ["en", "de", "en", "en"],
            "source": ["s1", "s1", "s1", "s2"],
            "n_chars": [10, 20, 31, 7],
        }
    )
    df.to_parquet(tmp_path / "documents.parquet")
    out = source_stats(str(tmp_path)).to_pandas().set_index("source")
    assert out.loc["s1", "n_docs"] == 3
    assert out.loc["s1", "n_langs"] == 2
    assert out.loc["s1", "total_chars"] == 61
    assert out.loc["s1", "avg_chars"] == round(61 / 3, 6)
    assert out.loc["s2", "n_docs"] == 1 and out.loc["s2", "n_langs"] == 1


def test_customers_without_orders_anti_join(ray_session, tmp_path):
    from vexor_ray.pipelines.relational import customers_without_orders

    pd.DataFrame(
        {
            "c_custkey": [1, 2, 3, 4],
            "c_mktsegment": ["A", "B", "C", "D"],
        }
    ).to_parquet(tmp_path / "customer.parquet")
    pd.DataFrame(
        {
            "o_custkey": [1, 2, 2, 9],
            "o_totalprice": [500.0, 50.0, 80.0, 999.0],
        }
    ).to_parquet(tmp_path / "orders.parquet")
    out = (
        customers_without_orders(str(tmp_path), min_totalprice=100.0)
        .to_pandas()
        .sort_values("c_custkey")
    )
    # cust 1 has a qualifying order; cust 2 only cheap ones; 3,4 none at all
    assert out["c_custkey"].tolist() == [2, 3, 4]
    assert out["c_mktsegment"].tolist() == ["B", "C", "D"]


def test_embedding_dup_clusters_chain(ray_session):
    import ray.data

    from vexor_ray.functions.ann import embedding_dup_clusters

    # three near-identical vectors (one SRP bucket, pairwise cosine ~1) and
    # one orthogonal singleton
    vecs = [
        [1.0, 0.0, 0.0, 0.0],
        [1.0, 0.001, 0.0, 0.0],
        [1.0, 0.0, 0.001, 0.0],
        [0.0, 1.0, 0.0, 0.0],
    ]
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": [10, 11, 12, 20],
                "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            }
        )
    )
    out = (
        embedding_dup_clusters(emb, threshold=0.9)
        .to_pandas()
        .sort_values("vec_id")
    )
    assert out["vec_id"].tolist() == [10, 11, 12]  # singleton emits nothing
    assert out["cluster_id"].tolist() == [10, 10, 10]


# ---------------------------------------------------------------------------
# sequence packing (global ordered prefix sum)


def test_pack_sequences_prefix_sum(ray_session, tmp_path):
    from vexor_ray.pipelines.relational import pack_sequences

    texts = ["a b c", "d e", "f g h i", "j", "k l m n o p"]  # 3,2,4,1,6 tokens
    pd.DataFrame({"doc_id": range(5), "text": texts}).to_parquet(
        tmp_path / "documents.parquet"
    )
    out = (
        pack_sequences(str(tmp_path), capacity=4, n_ranges=3)
        .to_pandas()
        .sort_values("doc_id")
    )
    # exclusive prefix sums: 0,3,5,9,10 -> bins 0,0,1,2,2 at capacity 4
    assert out["n_tokens"].tolist() == [3, 2, 4, 1, 6]
    assert out["bin_id"].tolist() == [0, 0, 1, 2, 2]


# ---------------------------------------------------------------------------
# decontamination / domain capping


def test_decontaminate_flags_shared_spans(ray_session):
    import ray.data

    from vexor_ray.functions.dedup import decontaminate

    span = "one two three four five six seven eight"
    eval_docs = ray.data.from_arrow(
        pa.table({"doc_id": [0], "text": [span + " benchmark tail"]})
    )
    corpus = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [10, 11, 12],
                "text": [
                    "prefix " + span + " suffix",      # shares the 8-gram
                    "totally different words here with no overlap at all ok",
                    "one two three four five six SEVEN different",  # 8-gram broken
                ],
            }
        )
    )
    out = decontaminate(corpus, eval_docs, window=8).to_pandas()
    assert out["doc_id"].tolist() == [10]


def test_cap_per_source(ray_session, tmp_path):
    from vexor_ray.functions.dedup import md5_u64
    from vexor_ray.pipelines.relational import cap_per_source

    df = pd.DataFrame(
        {
            "doc_id": range(30),
            "text": ["x"] * 30,
            "lang": ["en"] * 30,
            "source": ["big"] * 25 + ["small"] * 5,
            "n_chars": [1] * 30,
        }
    )
    df.to_parquet(tmp_path / "documents.parquet")
    out = cap_per_source(str(tmp_path), cap=10).to_pandas()
    big = out[out["source"] == "big"]["doc_id"].tolist()
    assert len(big) == 10  # capped
    assert len(out[out["source"] == "small"]) == 5  # under cap: all kept
    # membership = 10 smallest by (md5(doc_id), doc_id) within the source
    expect = sorted(range(25), key=lambda d: (md5_u64(str(d).encode()), d))[:10]
    assert sorted(big) == sorted(expect)


# ---------------------------------------------------------------------------
# IDF-weighted hash embeddings


def test_bucket_doc_freq_counts(ray_session):
    import ray.data

    from vexor_ray.functions.dedup import md5_u64
    from vexor_ray.functions.embed import bucket_doc_freq

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": ["alpha beta", "alpha beta", ""],  # bigram: "alpha beta"
            }
        )
    )
    df, n_docs = bucket_doc_freq(docs, dim=16, mode="word", n=2)
    assert n_docs == 3
    b = md5_u64(b"alpha beta") % 16
    assert df[b] == 2  # two docs contain the bigram; empty doc counts nowhere
    assert df.sum() == 2


def test_idf_weights_dyadic_and_monotone():
    from vexor_ray.functions.embed import IDF_QUANT, idf_weights

    df = np.array([0, 1, 10, 99], dtype=np.int64)
    w = idf_weights(df, n_docs=99)
    # dyadic grid: exact multiples of 1/1024
    assert np.all(w * IDF_QUANT == np.round(w * IDF_QUANT))
    # rarer bucket -> larger weight; always positive
    assert np.all(np.diff(w) < 0) and np.all(w > 0)


def test_hash_embed_idf_downweights_common_grams():
    from vexor_ray.functions.embed import hash_embed, idf_weights

    dim = 32
    # bucket of "common gram" gets df=90/100 docs, the rest df=1
    from vexor_ray.functions.dedup import md5_u64

    common = "the cat"
    rare = "quetzal xylophone"
    df = np.ones(dim, dtype=np.int64)
    df[md5_u64(common.encode()) % dim] = 90
    idf = idf_weights(df, n_docs=100)
    emb = hash_embed([common + " " + rare.split()[0] + " " +
                      rare.split()[1]], dim=dim, n=2, mode="word",
                     as_float32=False, idf=idf)[0]
    b_common = md5_u64(common.encode()) % dim
    b_rare = md5_u64(rare.encode()) % dim
    assert abs(emb[b_rare]) > abs(emb[b_common])  # rare gram dominates


def test_word_mix_grams_cover_all_granularities():
    """word_mix = unigrams ∪ 2..n-grams: short queries share features with
    documents at every granularity (the dense-arm eval headroom: dim 512
    word-bigrams scored MRR 0.29; dim 4096 word_mix scores 0.93)."""
    from vexor_ray.functions.embed import _grams, hash_embed

    g = _grams("red fox jumps", 2, "word_mix")
    assert g == {"red", "fox", "jumps", "red fox", "fox jumps"}
    g3 = _grams("a b c", 3, "word_mix")
    assert "a b c" in g3 and "a b" in g3 and "c" in g3
    assert _grams("", 2, "word_mix") == set()
    # a unigram query now has nonzero cosine against a doc containing it
    demb = hash_embed(["the quick brown fox ran"], dim=64, n=2,
                      mode="word_mix", as_float32=False)
    qemb = hash_embed(["fox"], dim=64, n=2, mode="word_mix", as_float32=False)
    assert float(demb @ qemb.T) > 0.0


def test_lm_quality_prefers_common_tokens(ray_session):
    import ray.data

    from vexor_ray.functions.sketch import lm_quality

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "common common common common",   # high-prob tokens
                    "zyxwv qporst unique tokens",    # rare tokens
                    "",                              # no tokens -> no row
                ],
            }
        )
    )
    out = lm_quality(docs).to_pandas().set_index("doc_id")
    assert out.index.tolist() == [1, 2]
    assert out.loc[1, "n_tokens"] == 4
    # the all-common doc scores strictly higher (less negative) avg logp
    assert out.loc[1, "avg_logp"] > out.loc[2, "avg_logp"]
    assert (out["avg_logp"] < 0).all()


# ---------------------------------------------------------------------------
# randomized brute-force cross-checks


def test_substring_dup_stats_matches_bruteforce_random(ray_session):
    import random

    import ray.data

    from vexor_ray.functions.dedup import substring_dup_stats
    from vexor_ray.spec import TOKEN_RE

    rng = random.Random(123)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
        for _ in range(60)
    ]
    W = 5
    docs = ray.data.from_arrow(
        pa.table({"doc_id": list(range(60)), "text": texts})
    )
    got = (
        substring_dup_stats(docs, window=W)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )

    # brute force: count every window occurrence corpus-wide
    from collections import Counter

    occ = Counter()
    per_doc: dict[int, list[str]] = {}
    for d, t in enumerate(texts):
        toks = TOKEN_RE.findall(t.lower())
        wins = [" ".join(toks[i : i + W]) for i in range(max(len(toks) - W + 1, 0))]
        per_doc[d] = wins
        occ.update(wins)
    for d, wins in per_doc.items():
        if not wins:
            assert d not in got.index
            continue
        n_dup = sum(occ[w] >= 2 for w in wins)
        assert got.loc[d, "n_windows"] == len(wins)
        assert got.loc[d, "n_dup_windows"] == n_dup


def test_rolling_hasher_matches_md5_decisions(ray_session):
    """The 100 TB rolling-polynomial window kernel makes exactly the same
    duplicated-span / contamination DECISIONS as the SQL-pinned md5 path
    (hash values differ; equal spans collide identically either way)."""
    import random

    import ray.data

    from vexor_ray.functions.dedup import decontaminate, substring_dup_stats

    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(25)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40)))
        for _ in range(80)
    ]
    texts[10] = texts[3]  # guaranteed cross-doc duplication
    docs = ray.data.from_arrow(pa.table({"doc_id": list(range(80)), "text": texts}))
    a = (
        substring_dup_stats(docs, window=5, hasher="md5")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        substring_dup_stats(docs, window=5, hasher="rolling")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert (a["n_dup_windows"] > 0).any()

    eval_docs = ray.data.from_arrow(
        pa.table({"doc_id": [0, 1], "text": [texts[3], "unique eval only text " * 3]})
    )
    hits_md5 = sorted(
        decontaminate(docs, eval_docs, window=5, hasher="md5")
        .to_pandas()["doc_id"]
        .tolist()
    )
    hits_roll = sorted(
        decontaminate(docs, eval_docs, window=5, hasher="rolling")
        .to_pandas()["doc_id"]
        .tolist()
    )
    assert hits_md5 == hits_roll and 3 in hits_md5 and 10 in hits_md5


def test_rolling_window_kernel_unit():
    """Window hashes: position-sensitive, boundary-masked, batch == per-doc."""
    import numpy as np

    from vexor_ray.functions.dedup import _batch_window_hashes_rolling

    h1, d1 = _batch_window_hashes_rolling(["a b c d", "c d a b"], 3)
    # 2 windows per doc, none straddling the boundary
    assert d1.tolist() == [0, 0, 1, 1]
    # same tokens, different order → different hashes (position-sensitive)
    assert h1[0] != h1[2]
    # identical window text → identical hash across docs
    h2, _ = _batch_window_hashes_rolling(["x y z", "q r x y z"], 3)
    assert h2[0] == h2[-1]
    # concatenated-batch result equals one-doc-at-a-time results
    texts = ["a b c d e", "", "b c", "c d e a b c"]
    hb, db = _batch_window_hashes_rolling(texts, 3)
    singles = [_batch_window_hashes_rolling([t], 3)[0] for t in texts]
    np.testing.assert_array_equal(hb, np.concatenate(singles))
    assert db.tolist() == [0, 0, 0, 3, 3, 3, 3]


def test_pack_sequences_matches_numpy_random(ray_session, tmp_path):
    import random

    from vexor_ray.pipelines.relational import pack_sequences
    from vexor_ray.spec import TOKEN_RE

    rng = random.Random(7)
    texts = [
        " ".join("tok" for _ in range(rng.randint(0, 40))) for _ in range(200)
    ]
    pd.DataFrame({"doc_id": range(200), "text": texts}).to_parquet(
        tmp_path / "documents.parquet"
    )
    cap = 64
    out = (
        pack_sequences(str(tmp_path), capacity=cap, n_ranges=7)
        .to_pandas()
        .sort_values("doc_id")
    )
    n_tokens = np.array([len(TOKEN_RE.findall(t)) for t in texts])
    starts = np.concatenate(([0], np.cumsum(n_tokens)[:-1]))
    assert out["n_tokens"].tolist() == n_tokens.tolist()
    assert out["bin_id"].tolist() == (starts // cap).tolist()


def test_brief_keywords_reference_semantics(ray_session):
    import ray.data

    from vexor_ray.functions.textstats import brief_keywords

    text = (
        "Widget the and for WIDGET gadget 中文关键 的 中文关键 gadget widget "
        "gadget ab a-b"
    )
    docs = ray.data.from_arrow(pa.table({"doc_id": [1], "text": [text]}))
    out = brief_keywords(docs).to_pandas().sort_values("kw_rank")
    # counts: widget 3, gadget 3, 中文关键 2, a-b 1; stopwords/len<3 dropped;
    # ties (widget==gadget) break by first occurrence; display = first raw
    # form ("Widget", capitalized); CJK keys rank after word keys at equal
    # counts but here counts differ
    assert out["keyword"].tolist() == ["Widget", "gadget", "中文关键", "a-b"]
    assert out["kw_rank"].tolist() == [1, 2, 3, 4]


def test_brief_keywords_cjk_after_words_on_ties(ray_session):
    import ray.data

    from vexor_ray.functions.textstats import brief_keywords

    # equal counts: CJK token occurs FIRST in the text but must rank after
    # the word keys (reference inserts all word keys before any CJK key)
    docs = ray.data.from_arrow(
        pa.table({"doc_id": [1], "text": ["汉字词 alpha beta 汉字词 alpha beta"]})
    )
    out = brief_keywords(docs).to_pandas().sort_values("kw_rank")
    assert out["keyword"].tolist() == ["alpha", "beta", "汉字词"]


def test_training_export_packs_only_survivors(ray_session, tmp_path):
    from vexor_ray.functions.dedup import clean_corpus
    from vexor_ray.pipelines.relational import training_export
    import ray.data

    # survivors need >= 25 tokens + low repetition to pass quality_filter
    def good(i):
        return " ".join(f"tok{i}w{j} filler{j}" for j in range(20))

    texts = [good(0), good(1), "short junk", good(2)]
    pd.DataFrame({"doc_id": range(4), "text": texts}).to_parquet(
        tmp_path / "documents.parquet"
    )
    out = (
        training_export(str(tmp_path), capacity=50)
        .to_pandas()
        .sort_values("doc_id")
    )
    keep = set(
        clean_corpus(
            ray.data.read_parquet(str(tmp_path / "documents.parquet"))
        ).to_pandas()["doc_id"]
    )
    assert set(out["doc_id"]) == keep  # doc 2 (junk) is gone
    assert 2 not in set(out["doc_id"])
    # bins = exclusive prefix sums over SURVIVORS in doc_id order
    starts = out["n_tokens"].cumsum() - out["n_tokens"]
    assert out["bin_id"].tolist() == (starts // 50).tolist()


def test_events_json_agg_parses_and_combines(ray_session, tmp_path):
    from vexor_ray.pipelines.relational import events_json_agg

    pd.DataFrame(
        {
            "event_type": ["a", "a", "b"],
            "props": ['{"k": 3}', '{"k": 7}', '{"k": 1}'],
        }
    ).to_parquet(tmp_path / "events.parquet")
    out = events_json_agg(str(tmp_path)).to_pandas().set_index("event_type")
    assert out.loc["a", "sum_k"] == 10 and out.loc["a", "max_k"] == 7
    assert out.loc["a", "n"] == 2 and out.loc["b", "n"] == 1


def test_temperature_sample_rates(ray_session):
    """T=2 language balancing: rarest language kept in full; realized
    per-language keep counts track floor(1e12*sqrt(nmin/n))/1e12 rates."""
    from vexor_ray.pipelines.relational import _read, temperature_sample_documents

    sf = "/root/testdata/sf0.001"
    before = (
        _read(sf, "documents", ["doc_id", "lang"]).to_pandas()["lang"].value_counts()
    )
    after = (
        temperature_sample_documents(sf).to_pandas()["lang"].value_counts()
    )
    nmin = int(before.min())
    rarest = before.idxmin()
    assert after.get(rarest, 0) == nmin  # rate exactly 1.0 for the rarest
    for lang, n in before.items():
        exp_rate = np.floor(1e12 * np.sqrt(np.float64(nmin) / np.float64(int(n)))) / 1e12
        got_rate = after.get(lang, 0) / n
        assert abs(got_rate - exp_rate) < 0.35  # md5 noise at 500-doc scale
    # flattening: post-sample spread strictly narrower than pre-sample
    assert after.max() / max(after.min(), 1) < before.max() / before.min()


def test_quality_buckets_ntile_semantics(ray_session):
    """Bucket sizes differ by <=1, the first (N % n) buckets carry the
    extra row, and bucket order is consistent with (score, doc_id) order."""
    from vexor_ray.pipelines.relational import quality_buckets

    df = quality_buckets("/root/testdata/sf0.001").to_pandas()
    n = len(df)
    sizes = df["bucket"].value_counts().sort_index()
    assert list(sizes.index) == [1, 2, 3, 4]
    lo, rem = n // 4, n % 4
    assert all(
        s == lo + (1 if b <= rem else 0) for b, s in sizes.items()
    )
    ordered = df.sort_values(["avg_logp", "doc_id"])["bucket"].to_numpy()
    assert (np.diff(ordered) >= 0).all()  # buckets non-decreasing in order


def test_more_like_this(ray_session):
    """Index-backed similar-document retrieval: source excluded, ranked by
    (rounded score desc, doc_id asc), deterministic, missing id raises."""
    from vexor_ray.pipelines.corpus import more_like_this_table

    sf = "/root/testdata/sf0.001"
    got = more_like_this_table(sf, doc_id=42, k=10, n_terms=10)
    ids = got.column("doc_id").to_pylist()
    sc = got.column("score").to_pylist()
    assert 42 not in ids
    assert len(ids) == 10
    assert sc == sorted(sc, reverse=True)
    for i in range(len(ids) - 1):
        if sc[i] == sc[i + 1]:
            assert ids[i] < ids[i + 1]
    # determinism
    again = more_like_this_table(sf, doc_id=42, k=10, n_terms=10)
    assert got.equals(again)
    with pytest.raises(KeyError):
        more_like_this_table(sf, doc_id=10_000_000)
