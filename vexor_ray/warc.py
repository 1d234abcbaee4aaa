"""WARC 1.0 source/sink — the Common-Crawl wire format, from scratch.

The engine's north-star input is "a Parquet table of Common-Crawl-style web
pages", but the crawl itself ships as WARC: concatenated per-record gzip
members, each holding a ``WARC/1.0`` record whose payload is a full HTTP
response.  This module closes that seam with no external libraries:

- :func:`write_warc_dataset` — pages Dataset → ``.warc.gz`` shards, one
  gzip MEMBER PER RECORD (the Common-Crawl discipline that makes byte-range
  access to individual records possible) written one file per batch by
  parallel Ray tasks; filenames derive from the first record's url hash, so
  re-runs are idempotent overwrites.
- :func:`read_warc` — ``.warc.gz`` files → pages Dataset:
  ``ray.data.read_binary_files`` (payload bytes never touch the driver) →
  a stateless parse ``map_batches``: member splitting via
  ``zlib.decompressobj`` + ``unused_data`` (no magic-byte scanning — a
  gzip magic inside compressed data cannot confuse it), WARC header parse,
  ``Content-Length``-delimited payload, HTTP envelope strip.

Round-trip is BYTE-exact for arbitrary binary payloads (pinned by
``tests/test_warc.py`` against wire-level golden bytes and the invalid-UTF-8
fixture rows; the driver query ``warc_roundtrip`` hash-checks
documents → WARC → parse against the identity SQL twin).

Scale notes: records stream through ``map_batches`` in both directions;
one task per WARC file on read (a crawl shard is ~1 GB — the natural task
granule).  Writing keeps a batch's records in memory once (bounded by
``batch_size`` × record size, the same budget as any wide-column stage).
"""

from __future__ import annotations

import hashlib
import os
import uuid
import zlib
from datetime import datetime, timezone
from pathlib import Path

import gzip

import pyarrow as pa
import ray.data

_CRLF = b"\r\n"
_WARC_VERSION = b"WARC/1.0"


def _warc_date(ts_us: int) -> str:
    dt = datetime.fromtimestamp(ts_us / 1_000_000, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def _parse_warc_date(s: str) -> int:
    dt = datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ").replace(
        tzinfo=timezone.utc
    )
    return int(dt.timestamp() * 1_000_000)


def build_record(url: str, ts_us: int, payload: bytes) -> bytes:
    """One WARC response record (uncompressed): WARC headers + an HTTP/1.1
    envelope around ``payload``.  Record-ID is the md5 of the url —
    deterministic, so identical inputs give identical bytes."""
    rid = hashlib.md5(url.encode("utf-8")).hexdigest()
    http = (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: text/html; charset=utf-8" + _CRLF
        + b"Content-Length: " + str(len(payload)).encode() + _CRLF
        + _CRLF
        + payload
    )
    head = (
        _WARC_VERSION + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Record-ID: <urn:md5:" + rid.encode() + b">" + _CRLF
        + b"WARC-Date: " + _warc_date(ts_us).encode() + _CRLF
        + b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
        + b"Content-Type: application/http; msgtype=response" + _CRLF
        + b"Content-Length: " + str(len(http)).encode() + _CRLF
        + _CRLF
    )
    return head + http + _CRLF + _CRLF


def parse_record(record: bytes) -> tuple[str, int, bytes] | None:
    """Inverse of :func:`build_record` → (url, ts_us, payload).

    Tolerant of any header order / extra headers; NON-RESPONSE records
    (warcinfo, request, metadata — real crawl files interleave them with
    responses) return ``None`` and are skipped by the reader.  Strict
    about structure (version line, Content-Length framing, HTTP
    envelope) — malformed records raise ``ValueError`` rather than
    guessing.
    """
    head, sep, rest = record.partition(_CRLF + _CRLF)
    if not sep:
        raise ValueError("WARC record without header terminator")
    lines = head.split(_CRLF)
    if not lines[0].startswith(b"WARC/"):
        raise ValueError(f"bad WARC version line: {lines[0]!r}")
    headers: dict[bytes, bytes] = {}
    for ln in lines[1:]:
        name, _, value = ln.partition(b":")
        headers[name.strip().lower()] = value.strip()
    if headers.get(b"warc-type") != b"response":
        return None
    clen = int(headers[b"content-length"])
    if clen > len(rest):
        raise ValueError("truncated WARC payload")
    http = rest[:clen]
    http_head, sep, body = http.partition(_CRLF + _CRLF)
    if not sep or not http_head.startswith(b"HTTP/1.1 "):
        raise ValueError("bad HTTP envelope")
    url = headers[b"warc-target-uri"].decode("utf-8")
    ts_us = _parse_warc_date(headers[b"warc-date"].decode("ascii"))
    return url, ts_us, body


def iter_warc_records_stream(data: bytes):
    """Yield raw records from an UNCOMPRESSED concatenated WARC stream.

    Records are self-delimiting: header block (to the blank line) +
    ``Content-Length`` payload + the ``\\r\\n\\r\\n`` record separator.
    This is the path for sources that inflate the gzip members upstream
    (``ray.data.read_binary_files`` auto-decompresses ``.gz`` and
    concatenates the members — byte-equivalent to this framing).
    """
    pos = 0
    n = len(data)
    sep = _CRLF + _CRLF
    while pos < n:
        end_head = data.find(sep, pos)
        if end_head < 0:
            raise ValueError("WARC record without header terminator")
        head = data[pos : end_head]
        clen = None
        for ln in head.split(_CRLF)[1:]:
            name, _, value = ln.partition(b":")
            if name.strip().lower() == b"content-length":
                clen = int(value.strip())
        if clen is None:
            raise ValueError("WARC record without Content-Length")
        end_rec = end_head + len(sep) + clen + len(sep)
        if end_rec > n:
            raise ValueError("truncated WARC record")
        if data[end_rec - len(sep) : end_rec] != sep:
            raise ValueError("missing WARC record separator")
        yield data[pos:end_rec]
        pos = end_rec


def iter_warc_members(data: bytes):
    """Yield decompressed records from concatenated per-record gzip members."""
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        chunk = d.decompress(data[pos:])
        if not d.eof:
            raise ValueError("truncated gzip member")
        consumed = (n - pos) - len(d.unused_data)
        pos += consumed
        yield chunk


def write_warc_dataset(
    ds: ray.data.Dataset,
    out_dir: str | Path,
    *,
    url_col: str = "url",
    ts_col: str | None = "warc_ts",
    payload_col: str = "html",
) -> list[str]:
    """Pages Dataset → ``.warc.gz`` shards under ``out_dir`` (one gzip
    member per record, one file per batch); returns the file list.

    Shards are CONTENT-ADDRESSED: the filename is the md5 of the complete
    compressed shard bytes, so two different batches can never collide on
    a name (same name ⇒ same bytes, and the write is tmp-file + atomic
    rename, so a re-run is idempotent rather than corrupting).  Byte-
    identical duplicate batches — possible only on pathological input —
    coalesce into one shard.  ``out_dir`` should be empty (or dedicated to
    this dataset) when the shards are later ingested by glob: stale shards
    from a PREVIOUS run with different content keep their distinct names
    and would be picked up too.

    ``ts_col=None`` stamps every record with the epoch (deterministic
    corpora without a crawl timestamp, e.g. the ``documents`` table).
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    out_str = str(out)

    def write_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], type=pa.string()),
                             "n_records": pa.array([], type=pa.int64())})
        urls = batch.column(url_col).to_pylist()
        payloads = batch.column(payload_col).to_pylist()
        if ts_col is None:
            tss = [0] * batch.num_rows
        else:
            col = batch.column(ts_col)
            if pa.types.is_timestamp(col.type):
                tss = pa.compute.cast(col, pa.int64()).to_pylist()
            else:
                tss = col.to_pylist()
        buf = bytearray()
        for u, t, p in zip(urls, tss, payloads):
            if isinstance(p, str):
                p = p.encode("utf-8")
            buf += gzip.compress(build_record(u, int(t), p), mtime=0)
        # content-addressed name: distinct content can never collide, and
        # an identical re-write (re-run into the same out_dir) is a no-op
        data = bytes(buf)
        name = hashlib.md5(data).hexdigest()[:24]
        path = f"{out_str}/crawl-{name}.warc.gz"
        tmp = f"{out_str}/.crawl-{name}.{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pa.table(
            {
                "path": pa.array([path], type=pa.string()),
                "n_records": pa.array([batch.num_rows], type=pa.int64()),
            }
        )

    res = ds.map_batches(
        write_batch, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    return sorted(res["path"])


def read_warc(paths: list[str] | str) -> ray.data.Dataset:
    """``.warc.gz`` files → Dataset (url, warc_ts:int64 µs, html:binary).

    ``read_binary_files`` auto-inflates ``.gz`` suffixes inside the read
    task and concatenates the members; since WARC records are
    self-delimiting (Content-Length framing) the parser splits the
    inflated stream directly, and falls back to member-aware gzip
    splitting when handed raw compressed bytes (magic sniff).
    """
    files = ray.data.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        tss: list[int] = []
        payloads: list[bytes] = []
        for data in batch.column("bytes").to_pylist():
            if data[:2] == b"\x1f\x8b":  # raw member-compressed shard
                recs = iter_warc_members(data)
            else:  # source already inflated+concatenated the members
                recs = iter_warc_records_stream(data)
            for rec in recs:
                parsed = parse_record(rec)
                if parsed is None:  # warcinfo/request/metadata records
                    continue
                u, t, p = parsed
                urls.append(u)
                tss.append(t)
                payloads.append(p)
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": pa.array(tss, type=pa.int64()),
                "html": pa.array(payloads, type=pa.binary()),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)
