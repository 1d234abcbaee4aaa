"""Streaming ingestion: micro-batches → delta generations, watermark
visibility, late-data policies, crash/orphan adoption (SURVEY §2.9 streaming
analogue; reference is batch-only so the contract here is self-defined and
pinned against the batch engine: a stream of N batches must equal one batch
build over the same rows)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from vexor_ray.index.build import BuildConfig, build_index
from vexor_ray.query.searcher import Searcher
from vexor_ray.streaming import StreamingIngestor


def _cfg(**kw):
    base = dict(
        pre_extracted=True,
        doc_builder="text",
        num_waves=2,
        partitions_per_wave=2,
        shard_group_size=1,
        tokenize_concurrency=2,
        salt_shift=8,
    )
    base.update(kw)
    return BuildConfig(**base)


_US = 1_000_000


def _batch(tag: str, n: int, ts0_s: int, extra: str = "") -> pa.Table:
    urls = [f"{tag}/{i:04d}.html" for i in range(n)]
    texts = [
        f"{tag} common words page number {i} needle{tag} {extra}".strip()
        for i in range(n)
    ]
    ts = pa.array([(ts0_s + i) * _US for i in range(n)], pa.timestamp("us"))
    return pa.table(
        {"url": pa.array(urls), "text": pa.array(texts), "warc_ts": ts}
    )


def test_stream_equals_batch_and_watermark_visibility(ray_session, tmp_path):
    ing = StreamingIngestor(tmp_path / "s", _cfg())
    r1 = ing.ingest_batch(_batch("one", 30, 1000))
    s = ing.searcher()
    assert s.doc_count == 30
    assert r1["watermark_us"] == (1000 + 29) * _US
    # batch-two needle invisible before batch two commits
    assert s.search("needletwo", 5) == []

    r2 = ing.ingest_batch(_batch("two", 25, 2000))
    assert r2["watermark_us"] == (2000 + 24) * _US
    s.refresh()
    assert s.doc_count == 55
    hits = s.search_hits([{"query_id": 1, "query": "needletwo", "k": 3}]).to_pandas()
    assert hits["url"].iloc[0].startswith("two/")

    ing.ingest_batch(_batch("three", 20, 3000))

    # the streamed index equals one batch build over the same shards
    fresh = tmp_path / "fresh"
    build_index(ing.pages_dir, fresh, _cfg())
    s_stream, s_fresh = Searcher(ing.index_dir), Searcher(fresh)
    assert s_stream.doc_count == s_fresh.doc_count == 75
    for q in ["common words", "needleone", "needletwo", "needlethree",
              "page number", "absentterm"]:
        assert s_stream.search(q, 10, method="exact") == s_fresh.search(
            q, 10, method="exact"
        ), q

    # appends were DELTAS: three generations per wave, each covering only
    # its batch's shard; batch-one docs were never re-tokenized
    manifest = s_stream.manifest
    for w, gens in manifest["wave_gens"].items():
        assert [g["gen"] for g in gens] == [0, 1, 2]
        assert gens[1]["covers_files"] == [1]
        assert gens[2]["covers_files"] == [2]


def test_compact_after_stream_preserves_results(ray_session, tmp_path):
    ing = StreamingIngestor(tmp_path / "s", _cfg())
    ing.ingest_batch(_batch("one", 20, 1000))
    ing.ingest_batch(_batch("two", 20, 2000))
    want = Searcher(ing.index_dir).search("common words", 10, method="exact")
    ing.compact()
    manifest = Searcher(ing.index_dir).manifest
    for w, gens in manifest["wave_gens"].items():
        assert len(gens) == 1 and gens[0]["full"]
    assert Searcher(ing.index_dir).search("common words", 10, method="exact") == want


def test_late_data_drop_policy(ray_session, tmp_path):
    ing = StreamingIngestor(
        tmp_path / "s", _cfg(), late_policy="drop", allowed_lateness_s=100
    )
    ing.ingest_batch(_batch("one", 10, 5000))  # watermark = 5009s
    # 5 rows at 4000s are older than watermark-100s → dropped; 5 at 5500 kept
    late = _batch("late", 5, 4000)
    fresh = _batch("new", 5, 5500)
    r = ing.ingest_batch(pa.concat_tables([late, fresh]))
    assert r["rows_late_dropped"] == 5
    s = ing.searcher()
    assert s.doc_count == 15
    assert s.search("needlelate", 5) == []
    assert s.search("needlenew", 5) != []
    # watermark advanced to the kept rows' max
    assert r["watermark_us"] == (5500 + 4) * _US


def test_late_data_accept_policy(ray_session, tmp_path):
    ing = StreamingIngestor(
        tmp_path / "s", _cfg(), late_policy="accept", allowed_lateness_s=0
    )
    ing.ingest_batch(_batch("one", 10, 5000))
    r = ing.ingest_batch(_batch("late", 5, 1000))  # far behind the watermark
    assert r["rows_late_dropped"] == 0
    assert ing.searcher().doc_count == 15
    # watermark never regresses
    assert r["watermark_us"] == (5000 + 9) * _US


def test_crash_between_shard_and_build_is_adopted(ray_session, tmp_path):
    """Kill after the pages shard landed but before the build: queries keep
    serving the old watermark; recover() (or the next ingest) adopts the
    orphan and the result equals a clean stream."""
    from vexor_ray.index.manifest import InjectedFault

    root = tmp_path / "s"
    ing = StreamingIngestor(root, _cfg())
    ing.ingest_batch(_batch("one", 20, 1000))
    want_before = Searcher(ing.index_dir).search("common words", 10)

    # fault-injected ingest: shard lands, build dies on its 1st partition
    ing_faulty = StreamingIngestor(root, _cfg(fail_after_partitions=1))
    with pytest.raises(InjectedFault):
        ing_faulty.ingest_batch(_batch("two", 20, 2000))

    # committed surface unchanged: old watermark, old results
    assert ing.load_state()["next_seq"] == 1
    assert ing.watermark_us == (1000 + 19) * _US
    assert Searcher(ing.index_dir).search("common words", 10) == want_before

    # recovery adopts the orphan shard
    r = ing.recover()
    assert r is not None and r["adopted_orphans"] == 1
    assert ing.watermark_us == (2000 + 19) * _US
    s = ing.searcher()
    assert s.doc_count == 40
    assert s.search("needletwo", 5) != []
    assert ing.recover() is None  # idempotent: nothing left to adopt

    # a subsequent normal ingest continues the sequence
    ing.ingest_batch(_batch("three", 10, 3000))
    assert ing.searcher().doc_count == 50
    seqs = [c["seq"] for c in ing.load_state()["committed"]]
    assert seqs == [0, 1, 2]


def test_streaming_append_respects_deletion_ledger(ray_session, tmp_path):
    """A deleted url arriving AGAIN in a later stream batch stays deleted:
    build_index re-reads the ledger on every run and filters every newly
    tokenized group (index/deletes.py — no resurrection through appends)."""
    from vexor_ray.index.deletes import delete_docs

    ing = StreamingIngestor(tmp_path / "s", _cfg())
    ing.ingest_batch(_batch("one", 20, 1000))
    s0 = Searcher(ing.index_dir)
    n0 = s0.doc_count
    victim = "one/0003.html"
    delete_docs(ing.index_dir, [victim])
    s1 = Searcher(ing.index_dir)
    assert s1.live_doc_count == n0 - 1

    # the victim url arrives again in a NEW batch (re-crawl): dropped at
    # tokenize by the ledger filter, while the rest of the batch lands
    again = _batch("one", 5, 2000, extra="resurrected")
    ing.ingest_batch(again)
    # plus an unrelated batch
    ing.ingest_batch(_batch("two", 10, 3000))
    s2 = Searcher(ing.index_dir)
    hits = s2.search("resurrected", k=s2.live_doc_count)
    urls = s2.lookup_urls([d for d, _ in hits])
    assert victim not in set(urls.values())
    assert len(hits) == 4  # the other 4 re-crawled docs landed
    all_urls = set(
        s2._docs_ds.to_table(columns=["url"]).column("url").to_pylist()
    )
    assert victim not in all_urls or s2._has_tombs  # physically filtered
    # and still tombstone-consistent: the victim never surfaces
    for q in ("common words", "needleone"):
        got = s2.search(q, k=s2.live_doc_count)
        got_urls = s2.lookup_urls([d for d, _ in got])
        assert victim not in set(got_urls.values())


def test_snapshot_pin_across_streaming_appends(ray_session, tmp_path):
    """A reader pinned between micro-batches keeps serving that batch's
    state (streaming deltas only add files; retained snapshots protect
    their view) while the live searcher advances with the watermark."""
    from vexor_ray.index.manifest import list_manifests

    ing = StreamingIngestor(tmp_path / "s", _cfg())
    ing.ingest_batch(_batch("one", 30, 1000))
    snap1 = list_manifests(ing.index_dir)[-1]["name"]

    ing.ingest_batch(_batch("two", 25, 2000))
    ing.ingest_batch(_batch("three", 20, 3000))

    pinned = Searcher(ing.index_dir, manifest_name=snap1)
    live = Searcher(ing.index_dir)
    assert pinned.doc_count == 30 and live.doc_count == 75
    assert pinned.search("needletwo", 5) == []
    assert live.search("needletwo", 5)
    # pinned hits exist and all resolve to batch-one urls
    hits = pinned.search("needleone", 10, method="exact")
    assert hits
    urls = pinned.lookup_urls([d for d, _ in hits])
    assert all(u.startswith("one/") for u in urls.values())
