"""WARC 1.0 source/sink (vexor_ray/warc.py): wire-pinned record bytes,
member splitting, malformed-input refusals, and a byte-exact round-trip
over the pages fixture (including its invalid-UTF-8 html rows)."""

from __future__ import annotations

import gzip

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vexor_ray.warc import (
    build_record,
    iter_warc_members,
    parse_record,
)

URL = "https://site.example/a/b.html"
TS = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in µs


class TestWire:
    def test_record_bytes_pinned(self):
        rec = build_record(URL, TS, b"<html>hi</html>")
        assert rec == (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Record-ID: <urn:md5:558f78b1eb5f82ab1539b5b43e8282b8>\r\n"
            b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            b"WARC-Target-URI: https://site.example/a/b.html\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: 94\r\n"
            b"\r\n"
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            b"Content-Length: 15\r\n"
            b"\r\n"
            b"<html>hi</html>"
            b"\r\n\r\n"
        )

    def test_roundtrip_binary_payload(self):
        payload = bytes(range(256)) + b"\r\n\r\n" + bytes([255, 254])
        u, t, p = parse_record(build_record(URL, TS, payload))
        assert (u, t, p) == (URL, TS, payload)

    def test_header_order_tolerated(self):
        rec = build_record(URL, TS, b"x")
        head, _, rest = rec.partition(b"\r\n\r\n")
        lines = head.split(b"\r\n")
        reordered = b"\r\n".join([lines[0]] + lines[1:][::-1])
        u, t, p = parse_record(reordered + b"\r\n\r\n" + rest)
        assert (u, t, p) == (URL, TS, b"x")

    def test_non_response_records_skipped(self):
        info = (
            b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"Content-Length: 5\r\n\r\nhello\r\n\r\n"
        )
        assert parse_record(info) is None
        # a mixed stream yields only the response record
        from vexor_ray.warc import iter_warc_records_stream

        resp = build_record(URL, TS, b"x")
        recs = [parse_record(r) for r in iter_warc_records_stream(info + resp)]
        assert [r for r in recs if r is not None] == [(URL, TS, b"x")]

    def test_malformed_refused(self):
        with pytest.raises(ValueError):
            parse_record(b"GARBAGE\r\n\r\nx")
        rec = build_record(URL, TS, b"payload")
        with pytest.raises(ValueError):
            parse_record(rec[:-20])  # truncated below Content-Length

    def test_member_split(self):
        a = gzip.compress(b"first", mtime=0)
        b = gzip.compress(b"second", mtime=0)
        assert list(iter_warc_members(a + b)) == [b"first", b"second"]
        with pytest.raises(ValueError):
            list(iter_warc_members(a[:-4]))


class TestRayRoundtrip:
    def test_pages_fixture_byte_exact(self, ray_session, pages_1k, tmp_path):
        import ray

        from vexor_ray.warc import read_warc, write_warc_dataset

        files = sorted(pages_1k.glob("part-*.parquet"))[:1]
        src = pq.read_table(files[0], columns=["url", "warc_ts", "html"])
        ds = ray.data.read_parquet([str(f) for f in files])
        out = tmp_path / "warc"
        paths = write_warc_dataset(
            ds, out, url_col="url", ts_col="warc_ts", payload_col="html"
        )
        assert paths and all(p.endswith(".warc.gz") for p in paths)
        # one gzip member per record: a shard holding k records must start
        # with k magic sequences at member boundaries — spot-check count by
        # decompressing members
        n_members = sum(
            len(list(iter_warc_members(open(p, "rb").read()))) for p in paths
        )
        assert n_members == src.num_rows

        back = (
            read_warc(paths)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        want = src.to_pandas().sort_values("url").reset_index(drop=True)
        assert back["url"].tolist() == want["url"].tolist()
        # binary payloads byte-exact (fixture includes invalid-UTF-8 rows)
        assert [bytes(x) for x in back["html"]] == [
            bytes(x) for x in want["html"]
        ]
        import numpy as np

        want_us = (
            want["warc_ts"].astype("datetime64[us]").astype(np.int64)
        )
        # WARC-Date is second-resolution; fixture timestamps are whole
        # seconds so the round-trip is exact
        assert back["warc_ts"].tolist() == want_us.tolist()


    def test_shard_names_survive_duplicate_first_url(self, ray_session, tmp_path):
        """Shards are content-addressed: batches sharing their FIRST url
        (the old naming key) land in distinct files and no records are
        lost; a re-run into the same dir is idempotent."""
        import ray

        from vexor_ray.warc import read_warc, write_warc_dataset

        def mk_ds():
            t1 = pa.table(
                {
                    "url": pa.array(["https://corpus.example/a", "https://corpus.example/b"]),
                    "html": pa.array([b"batch-one-a", b"batch-one-b"]),
                }
            )
            t2 = pa.table(
                {
                    "url": pa.array(["https://corpus.example/a", "https://corpus.example/c"]),
                    "html": pa.array([b"batch-two-a", b"batch-two-c"]),
                }
            )
            return ray.data.from_arrow([t1, t2])

        out = tmp_path / "warc_dup"
        paths = write_warc_dataset(mk_ds(), out, ts_col=None)
        assert len(set(paths)) == 2  # distinct content -> distinct names
        back = read_warc(sorted(set(paths))).to_pandas()
        assert len(back) == 4  # no batch silently overwritten
        # idempotent re-run: same content, same names, still 4 records
        paths2 = write_warc_dataset(mk_ds(), out, ts_col=None)
        assert sorted(set(paths2)) == sorted(set(paths))
        assert len(list(out.glob("*.warc.gz"))) == 2
        assert not list(out.glob("*.tmp"))


class TestWarcStreaming:
    def test_warc_shards_stream_into_index(self, ray_session, tmp_path):
        """Crawl-arrival composition: each .warc.gz shard becomes one
        streaming micro-batch; the streamed index must equal a batch build
        over the same pages and the watermark must track WARC-Date."""
        import gzip as _gzip

        import pyarrow as pa
        import ray

        from vexor_ray.index.build import BuildConfig, build_index
        from vexor_ray.query.searcher import Searcher
        from vexor_ray.streaming import StreamingIngestor
        from vexor_ray.warc import build_record, read_warc

        cfg = BuildConfig(
            pre_extracted=True,
            doc_builder="text",
            num_waves=2,
            partitions_per_wave=2,
            shard_group_size=1,
            tokenize_concurrency=2,
            salt_shift=8,
        )
        us = 1_000_000
        shards = []
        for tag, ts0 in (("one", 1000), ("two", 2000), ("three", 3000)):
            buf = bytearray()
            for i in range(20):
                buf += _gzip.compress(
                    build_record(
                        f"{tag}/{i:04d}.html",
                        (ts0 + i) * us,
                        f"{tag} common words page {i} needle{tag}".encode(),
                    ),
                    mtime=0,
                )
            p = tmp_path / f"crawl-{tag}.warc.gz"
            p.write_bytes(bytes(buf))
            shards.append(str(p))

        ing = StreamingIngestor(tmp_path / "s", cfg)
        for shard, ts0 in zip(shards, (1000, 2000, 3000)):
            tbl = read_warc([shard]).to_arrow_refs()
            tbl = pa.concat_tables([t for t in ray.get(tbl) if t.num_rows])
            batch = pa.table(
                {
                    "url": tbl.column("url"),
                    "text": pa.array(
                        [h.decode("utf-8") for h in tbl.column("html").to_pylist()]
                    ),
                    "warc_ts": tbl.column("warc_ts").cast(pa.timestamp("us")),
                }
            )
            r = ing.ingest_batch(batch)
            assert r["watermark_us"] == (ts0 + 19) * us

        fresh = tmp_path / "fresh"
        build_index(ing.pages_dir, fresh, cfg)
        s_stream, s_fresh = Searcher(ing.index_dir), Searcher(fresh)
        assert s_stream.doc_count == s_fresh.doc_count == 60
        for q in ["common words", "needleone", "needletwo", "needlethree"]:
            assert s_stream.search(q, 10, method="exact") == s_fresh.search(
                q, 10, method="exact"
            ), q
