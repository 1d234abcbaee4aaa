"""span_dedup_rewrite: C4-style duplicate-span removal (functions/dedup.py).

Checks the distributed rewrite against a pure-python brute-force reference
on hand and randomized corpora, and that the rolling-hash map kernel makes
identical removal decisions to the SQL-twinned md5 path.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest

TOKEN_RE = re.compile(r"[a-z0-9_]+")


def _brute_rewrite(rows: list[tuple[int, str]], window: int) -> pd.DataFrame:
    toks = {d: TOKEN_RE.findall((t or "").lower()) for d, t in rows}
    occ: dict[tuple[str, ...], list[tuple[int, int]]] = {}
    for d in sorted(toks):
        tl = toks[d]
        for s in range(len(tl) - window + 1):
            occ.setdefault(tuple(tl[s : s + window]), []).append((d, s))
    covered: dict[int, set[int]] = {d: set() for d in toks}
    for places in occ.values():
        if len(places) < 2:
            continue
        first = min(places)
        for d, s in places:
            if (d, s) != first:
                covered[d].update(range(s, s + window))
    out = []
    for d in sorted(toks):
        tl = toks[d]
        kept = [t for i, t in enumerate(tl) if i not in covered[d]]
        out.append(
            {
                "doc_id": d,
                "text": " ".join(kept),
                "n_tokens": len(tl),
                "n_removed": len(tl) - len(kept),
            }
        )
    return pd.DataFrame(out)


def _run(rows, window, hasher="md5"):
    import ray.data

    from vexor_ray.functions.dedup import span_dedup_rewrite

    docs = ray.data.from_items(
        [{"doc_id": d, "text": t} for d, t in rows]
    ).repartition(4)
    got = (
        span_dedup_rewrite(docs, window=window, hasher=hasher)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got["text"] = got["text"].astype(str)
    return got[["doc_id", "text", "n_tokens", "n_removed"]]


def test_span_rewrite_hand_corpus(ray_session):
    span = "a b c d"  # window=4 duplicated span
    rows = [
        (1, f"x y {span} z"),  # first occurrence (pos 2) survives
        (2, f"p {span} q r"),  # second occurrence removed
        (3, "unrelated words only here"),
        (4, f"{span} {span}"),  # both occurrences later than doc1's -> gone
    ]
    got = _run(rows, window=4)
    exp = _brute_rewrite(rows, 4).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))
    r2 = got[got.doc_id == 2].iloc[0]
    assert r2["text"] == "p q r" and r2["n_removed"] == 4
    r4 = got[got.doc_id == 4].iloc[0]
    # doc4 = "a b c d a b c d": dup spans cover every position (the
    # straddling windows "b c d a" etc. also repeat nowhere, but the two
    # "a b c d" occurrences are both non-first vs doc1's)
    assert r4["n_removed"] == 8 and r4["text"] == ""


def test_span_rewrite_short_and_empty_docs(ray_session):
    rows = [(1, "a b"), (2, ""), (3, "a b")]  # shorter than window: untouched
    got = _run(rows, window=4)
    assert got["n_removed"].tolist() == [0, 0, 0]
    assert got["text"].tolist() == ["a b", "", "a b"]


@pytest.mark.parametrize("hasher", ["md5", "rolling"])
def test_span_rewrite_matches_bruteforce_random(ray_session, hasher):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (d, " ".join(rng.choice(vocab, size=rng.integers(3, 40)).tolist()))
        for d in range(40)
    ]
    W = 5
    got = _run(rows, window=W, hasher=hasher)
    exp = _brute_rewrite(rows, W).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))


def test_explode_window_pos_rolling_matches_md5(ray_session):
    import pyarrow as pa

    from vexor_ray.functions.dedup import _explode_window_hashes_pos

    batch = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b c d e", "x y", "c d e f g h"],
        }
    )
    _, id_m, s_m = _explode_window_hashes_pos(batch, 3, "md5")
    _, id_r, s_r = _explode_window_hashes_pos(batch, 3, "rolling")
    assert id_m.tolist() == id_r.tolist()
    assert s_m.tolist() == s_r.tolist()
