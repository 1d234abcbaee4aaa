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
