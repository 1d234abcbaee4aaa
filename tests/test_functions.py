"""Unit tests for the training-data operators (dedup / ann / textstats / mm)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def docs_tbl():
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta theta",  # exact dup of 0
        "alpha beta gamma delta epsilon zeta eta iota",  # near dup of 0
        "the quick brown fox jumps over the lazy dog",
        "совершенно другой текст",  # no ascii tokens
        "one two three four five six seven eight nine ten",
    ]
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


@pytest.fixture(scope="module")
def docs_ds(ray_session, docs_tbl):
    import ray.data

    return ray.data.from_arrow(docs_tbl)


def test_exact_duplicates(docs_ds):
    from vexor_ray.functions.dedup import exact_duplicates

    df = exact_duplicates(docs_ds).to_pandas()
    dup_row = df[df["n_dups"] == 2]
    assert len(dup_row) == 1
    assert dup_row["keep_doc_id"].iloc[0] == 0
    assert df["n_dups"].sum() == 6


def test_minhash_lsh_finds_near_dup(docs_ds):
    from vexor_ray.functions.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs_ds, threshold=0.3).to_pandas()
    got = {tuple(p) for p in pairs[["doc_a", "doc_b"]].values.tolist()}
    assert (0, 1) in got  # exact dup always collides, jaccard 1.0
    assert (0, 2) in got or (1, 2) in got  # near dup
    assert all(a < b for a, b in got)
    j = pairs.set_index(["doc_a", "doc_b"])["jaccard"]
    assert j.loc[(0, 1)] == 1.0

    # the shuffle-join verify (100 TB path) must produce the identical
    # pair set as the broadcast verify
    joined = minhash_lsh_pairs(
        docs_ds, threshold=0.3, broadcast_cands_threshold=0
    ).to_pandas()
    assert (
        sorted(map(tuple, joined[["doc_a", "doc_b", "jaccard"]].values.tolist()))
        == sorted(map(tuple, pairs[["doc_a", "doc_b", "jaccard"]].values.tolist()))
    )


def test_simhash_and_pairs(docs_ds):
    from vexor_ray.functions.dedup import simhash_dup_pairs, simhash_signatures

    sigs = simhash_signatures(docs_ds).to_pandas().set_index("doc_id")["simhash"]
    assert sigs.loc[0] == sigs.loc[1]  # identical text → identical simhash
    assert sigs.loc[0] != sigs.loc[3]
    pairs = simhash_dup_pairs(docs_ds, max_hamming=3).to_pandas()
    got = {tuple(p) for p in pairs[["doc_a", "doc_b"]].values.tolist()}
    assert (0, 1) in got


def test_ngram_jaccard():
    from vexor_ray.functions.dedup import ngram_jaccard

    a = "alpha beta gamma delta"
    sims = ngram_jaccard([a, a], [a, "x y z w"], n=2)
    assert sims[0] == 1.0
    assert sims[1] == 0.0


def test_rolling_hash_shift_invariant_window():
    from vexor_ray.functions.textstats import rolling_hash_batch

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": [
                "PREFIX common stable payload here",
                "OTHER! common stable payload here",
                "completely unrelated content zzz",
            ],
        }
    )
    out = rolling_hash_batch(t).to_pydict()
    # min-rolling-hash over windows is likely shared when a long substring is
    # shared; must at least be deterministic
    out2 = rolling_hash_batch(t).to_pydict()
    assert out == out2
    assert out["rolling_min_hash"][0] != out["rolling_min_hash"][2]


def test_langid(docs_ds):
    from vexor_ray.functions.textstats import langid

    df = langid(docs_ds).to_pandas().set_index("doc_id")["lang_pred"]
    assert df.loc[3] == "en"  # 'the' twice, 'over' ...
    assert df.loc[4] == "und"


def test_brute_force_topk_exact(ray_session):
    import ray.data

    from vexor_ray.functions.ann import brute_force_topk

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((200, 16))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(200), type=pa.int64()),
            "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    q = vecs[:3].astype(np.float64)
    out = brute_force_topk(ds, q, k=5).to_pandas()
    # rank 1 per query must be the query vector itself with cosine ~1
    top1 = out[out["rank"] == 1].sort_values("query_idx")
    # float32 storage wiggles cosine; compare against float32-recomputed truth
    v32 = vecs.astype(np.float32).astype(np.float64)
    v32n = v32 / np.linalg.norm(v32, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = v32n @ qn.T
    for qi in range(3):
        assert top1["vec_id"].iloc[qi] == int(np.argmax(sims[:, qi]))
        assert abs(top1["cosine"].iloc[qi] - sims[:, qi].max()) < 1e-5
    assert (out.groupby("query_idx").size() == 5).all()


def test_lsh_topk_recall(ray_session):
    import ray.data

    from vexor_ray.functions.ann import lsh_topk

    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((500, 32))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(500), type=pa.int64()),
            "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    q = vecs[:2].astype(np.float64)
    out = lsh_topk(ds, q, k=3, n_planes=8).to_pandas()
    # the query vector itself shares its own bucket → rank-1 self-hit
    top1 = out[out["rank"] == 1].sort_values("query_idx")
    assert top1["vec_id"].tolist() == [0, 1]


def test_multimodal_plumbing(ray_session):
    import ray.data

    from vexor_ray.functions.multimodal import decode_images, sample_frames

    tbl = pa.table(
        {
            "id": pa.array([1, 2], type=pa.int64()),
            "payload": pa.array([b"fakeimagebytes", b"other"], type=pa.binary()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    out = decode_images(ds, concurrency=1).to_pandas()
    assert set(out.columns) == {"id", "width", "height", "feat"}
    assert len(out["feat"].iloc[0]) == 16
    # deterministic fake decode
    out2 = decode_images(ray.data.from_arrow(tbl), concurrency=1).to_pandas()
    assert out["width"].tolist() == out2["width"].tolist()

    frames = sample_frames(ds, every_n=5, concurrency=1).to_pandas()
    assert set(frames.columns) == {"id", "frame", "frame_hash"}
    assert (frames["frame"] % 5 == 0).all()


def test_sample_frames_real_decoder_raises_on_non_avi():
    from vexor_ray.functions.multimodal import SampleFrames

    batch = pa.table(
        {
            "id": pa.array([0], type=pa.int64()),
            "payload": pa.array([b"not a container"], type=pa.binary()),
        }
    )
    with pytest.raises(NotImplementedError):
        SampleFrames(real=True)(batch)


def test_repetition_stats(ray_session):
    import ray.data

    from vexor_ray.functions.textstats import repetition

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": pa.array(
                [
                    "spam spam spam spam",          # one token repeated
                    "a b c d e f g h",              # all distinct
                    "x y x y x y",                  # repeated bigram chain
                    "",                              # zero tokens -> no row
                ]
            ),
        }
    )
    df = (
        repetition(ray.data.from_arrow(tbl))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(df.index) == [0, 1, 2]  # empty doc emits no row
    assert df.loc[0, "top_token_frac"] == 1.0
    assert df.loc[0, "top_2gram_frac"] == 1.0       # "spam spam" x3 of 3
    assert df.loc[0, "dup_2gram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert df.loc[1, "top_token_frac"] == pytest.approx(1 / 8, abs=1e-6)
    assert df.loc[1, "dup_2gram_frac"] == 0.0
    # "x y x y x y": bigrams = [xy, yx, xy, yx, xy] -> top 3/5, dup 3/5
    assert df.loc[2, "top_2gram_frac"] == pytest.approx(3 / 5, abs=1e-6)
    assert df.loc[2, "dup_3gram_frac"] == pytest.approx(2 / 4, abs=1e-6)


def test_quality_filter_thresholds(ray_session):
    import ray.data

    from vexor_ray.functions.textstats import quality_filter

    good = " ".join(f"word{i}" for i in range(30))
    repeaty = " ".join(["lorem ipsum"] * 20)        # top bigram frac high
    short = "too short"
    numeric = " ".join(str(i) for i in range(40))   # alpha ratio low
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": pa.array([good, repeaty, short, numeric]),
        }
    )
    kept = quality_filter(ray.data.from_arrow(tbl)).to_pandas()["doc_id"].tolist()
    assert kept == [0]


def test_duplicate_clusters_chain(ray_session):
    import ray.data

    from vexor_ray.functions.dedup import duplicate_clusters

    pairs = pa.table(
        {
            "doc_a": pa.array([1, 2, 4, 10, 10, 10], type=pa.int64()),
            "doc_b": pa.array([2, 3, 5, 11, 12, 13], type=pa.int64()),
        }
    )
    expected = {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 10: 10, 11: 10, 12: 10, 13: 10}
    # chain 1-2-3 collapses transitively; star 10-{11,12,13} keeps min id —
    # identical from the driver union-find fast path and the distributed
    # label-propagation path (driver_pairs_threshold=0 forces the latter)
    for thr in (2_000_000, 0):
        df = duplicate_clusters(
            ray.data.from_arrow(pairs), driver_pairs_threshold=thr
        ).to_pandas()
        got = dict(zip(df["doc_id"], df["cluster_id"]))
        assert got == expected, f"threshold={thr}"


def test_duplicate_clusters_empty(ray_session):
    import ray.data

    from vexor_ray.functions.dedup import duplicate_clusters

    pairs = pa.table(
        {
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
        }
    )
    assert duplicate_clusters(ray.data.from_arrow(pairs)).count() == 0


def test_clean_corpus_composition(ray_session):
    import ray.data

    from vexor_ray.functions.dedup import clean_corpus

    good = " ".join(f"tok{i}" for i in range(40))
    near_a = " ".join(f"word{i}" for i in range(40))
    near_b = " ".join(f"word{i}" for i in range(39)) + " tail"
    repeaty = " ".join(["lorem ipsum"] * 30)
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4, 5], type=pa.int64()),
            "text": pa.array([good, good, near_a, near_b, repeaty, "short"]),
        }
    )
    kept = sorted(
        clean_corpus(ray.data.from_arrow(tbl)).to_pandas()["doc_id"].tolist()
    )
    # 1 = exact dup of 0 (dropped), 3 = near dup of 2 (non-canonical),
    # 4 fails repetition caps, 5 fails min_tokens
    assert kept == [0, 2]
