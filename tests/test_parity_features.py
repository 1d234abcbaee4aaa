"""Reference-parity surfaces: hybrid RRF, head/chunk modes, preview, CLI,
extractor registry, staleness check."""

from __future__ import annotations

import json
import subprocess
import sys

import numpy as np
import pytest

from vexor_ray.fixtures.pages import write_pages
from vexor_ray.index.build import BuildConfig, build_index
from vexor_ray.query.searcher import Searcher
from vexor_ray.refimpl import bm25 as refbm25
from vexor_ray.refimpl import build_oracle_index, textnorm
from vexor_ray.stages.docids import doc_id_base


def _oracle_for(pages_dir, **kw):
    import pyarrow.parquet as pq

    pages, ids = [], []
    for fi, f in enumerate(sorted(pages_dir.glob("part-*.parquet"))):
        tbl = pq.read_table(f, columns=["url", "html"])
        for ri, (u, h) in enumerate(
            zip(tbl.column("url").to_pylist(), tbl.column("html").to_pylist())
        ):
            pages.append((u, h))
            ids.append(doc_id_base(fi, ri))
    return build_oracle_index(pages, ids=ids, **kw)


def test_hybrid_rrf_matches_reference_semantics(built_index, oracle_1k):
    out, _ = built_index
    s = Searcher(out)
    # any deterministic dense order works as input; use ascending docIDs of
    # needle hits plus some unrelated docs
    all_ids = sorted(oracle_1k.urls)
    dense_order = all_ids[:50]
    query = "needledften retrieval"
    got = s.search_hybrid(query, dense_order, k=20)

    # reference fusion computed from the oracle's bm25 scores over row space
    row_of = {d: i for i, d in enumerate(all_ids)}
    bm25_scores = refbm25.score_postings(
        refbm25.preprocess_query(query),
        oracle_1k.postings,
        oracle_1k.doc_count,
        oracle_1k.avg_doc_len,
    )
    fused = refbm25.rrf_fuse(
        [row_of[d] for d in dense_order],
        {row_of[d]: sc for d, sc in bm25_scores.items()},
        len(all_ids),
    )
    expected = sorted(
        ((all_ids[i], f) for i, f in enumerate(fused) if f > 0),
        key=lambda item: (-item[1], item[0]),
    )[:20]
    assert [d for d, _ in got] == [d for d, _ in expected]
    for (_, gs), (_, es) in zip(got, expected):
        assert abs(gs - es) < 1e-6


def test_head_doc_builder_rank_identity(ray_session, tmp_path):
    pages = write_pages(tmp_path / "pages", 300, seed=42, rows_per_file=100)
    idx = tmp_path / "idx_head"
    build_index(
        pages,
        idx,
        BuildConfig(num_waves=1, shard_group_size=2, tokenize_concurrency=2,
                    doc_builder="head"),
    )
    oracle = _oracle_for(pages, doc_builder="head")
    s = Searcher(idx)
    from vexor_ray.refimpl import search as oracle_search

    for q in ["needledfone", "the qa zo", "buca deli"]:
        got = s.search(q, 10, method="exact")
        want = oracle_search(oracle, q, 10)
        assert [d for d, _ in got] == [d for d, _ in want], q


def test_chunked_corpus_build(ray_session, tmp_path):
    from vexor_ray.stages.chunker import chunk_pages

    pages = write_pages(tmp_path / "pages", 200, seed=42, rows_per_file=100)
    chunk_files = chunk_pages(pages, tmp_path / "chunks", chunk_size=500, overlap=50)
    assert len(chunk_files) == 2
    idx = tmp_path / "idx_chunks"
    build_index(
        chunk_files,
        idx,
        BuildConfig(pre_extracted=True, num_waves=1, shard_group_size=2,
                    tokenize_concurrency=2),
    )
    s = Searcher(idx)
    # oracle over the chunk corpus: chunk urls + text, same lineage ids
    import pyarrow.parquet as pq

    pages_list, ids = [], []
    for fi, f in enumerate(chunk_files):
        tbl = pq.read_table(f)
        for ri, (u, t) in enumerate(
            zip(tbl.column("url").to_pylist(), tbl.column("text").to_pylist())
        ):
            pages_list.append((u, None, t))
            ids.append(doc_id_base(fi, ri))
    oracle = build_oracle_index(pages_list, ids=ids)
    from vexor_ray.refimpl import search as oracle_search

    assert s.doc_count == oracle.doc_count
    for q in ["needledfone", "zo qa", "buca"]:
        got = s.search(q, 10, method="exact")
        want = oracle_search(oracle, q, 10)
        assert [d for d, _ in got] == [d for d, _ in want], q
    # a long page must produce multiple chunk docs sharing the url stem
    urls = list(oracle.urls.values())
    stems = {}
    for u in urls:
        stems.setdefault(u.split("#chunk")[0], 0)
        stems[u.split("#chunk")[0]] += 1
    assert max(stems.values()) > 1


def test_preview_in_hits(built_index):
    out, _ = built_index
    s = Searcher(out)
    hits = s.search_hits([{"query_id": 1, "query": "needledften", "k": 3}])
    previews = hits["preview"].to_pylist()
    assert all(p and len(p) <= textnorm.PREVIEW_CHAR_LIMIT for p in previews)


def test_make_preview():
    assert textnorm.make_preview("a  b\n\nc") == "a b c"
    long = "word " * 100
    p = textnorm.make_preview(long)
    assert len(p) <= 160 and p.endswith("…")


def test_staleness_check(ray_session, tmp_path):
    pages = write_pages(tmp_path / "pages", 200, seed=42, rows_per_file=100)
    idx = tmp_path / "idx"
    build_index(pages, idx, BuildConfig(num_waves=1, shard_group_size=2,
                                        tokenize_concurrency=2))
    s = Searcher(idx)
    assert s.is_current()
    sorted(pages.glob("part-*.parquet"))[0].touch()
    assert not s.is_current()


def test_extractor_registry(ray_session):
    import pyarrow as pa

    from vexor_ray.stages.extract import (
        clear_extractors,
        make_extract_fn,
        register_extractor,
    )

    batch = pa.table(
        {
            "url": ["https://x.example/a.html", "https://x.example/b.pdf"],
            "html": [b"plain text", b"%PDF-fake-binary"],
        }
    )
    # default: every suffix goes through the byte-identical UTF-8 path
    out = make_extract_fn()(batch)
    assert out.column("text").to_pylist() == ["plain text", "%PDF-fake-binary"]
    # a registered extractor overrides only its suffix
    register_extractor((".pdf",), lambda payload, limit: "decoded-pdf-text")
    try:
        out = make_extract_fn()(batch)
        assert out.column("text").to_pylist() == ["plain text", "decoded-pdf-text"]
    finally:
        clear_extractors()


def test_cli_build_and_search(ray_session, tmp_path):
    pages = write_pages(tmp_path / "pages", 120, seed=42, rows_per_file=60)
    idx = tmp_path / "idx_cli"
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "-m", "vexor_ray", "--num-cpus", "2", "build",
         "--input", str(pages), "--out", str(idx), "--waves", "1"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["stats"]["doc_count"] > 100
    r = subprocess.run(
        [sys.executable, "-m", "vexor_ray", "search", "--index", str(idx),
         "--query", "needledfone", "-k", "3", "--porcelain"],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    assert lines and lines[0].split("\t")[0] == "1"


def test_cli_positions_phrase_expand(ray_session, tmp_path):
    """New CLI surfaces: positions build, phrase/NEAR queries, dictionary
    expansion (suggest/prefix/fuzzy) — each prints parseable output."""
    pages = write_pages(tmp_path / "pages", 120, seed=42, rows_per_file=60)
    idx = tmp_path / "idx_cli2"
    pos = tmp_path / "pos_cli"
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "RAY_ADDRESS": "local"}

    def run(*args, timeout=300):
        r = subprocess.run(
            [sys.executable, "-m", "vexor_ray", *args],
            capture_output=True, text=True, env=env, timeout=timeout,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout

    run("--num-cpus", "2", "build", "--input", str(pages), "--out", str(idx),
        "--waves", "1")
    out = run("--num-cpus", "2", "positions", "--input", str(pages),
              "--out", str(pos))
    gens = json.loads(out.strip().splitlines()[-1])["pos_wave_gens"]
    assert gens == {"0": [0]}

    out = run("phrase", "--positions", str(pos), "--phrase", "body html",
              timeout=120)
    assert "n_occ" in out and len(out.splitlines()) > 1
    out = run("phrase", "--positions", str(pos), "--near", "head", "title",
              "--window", "4", timeout=120)
    assert "min_dist" in out

    out = run("expand", "--index", str(idx), "--term", "htmk", timeout=120)
    assert json.loads(out)["result"] == "html"
    out = run("expand", "--index", str(idx), "--term", "needledf",
              "--mode", "prefix", timeout=120)
    assert "needledfone" in json.loads(out)["result"]


def test_cli_snapshots_vacuum_explain_percolate(ray_session, tmp_path):
    """Eighth-session CLI surfaces: snapshots listing, snapshot-pinned
    search, snapshot-diff, vacuum --dry-run, explain, percolate."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from vexor_ray.fixtures.pages import generate_pages

    pages = write_pages(tmp_path / "pages", 120, seed=42, rows_per_file=60)
    idx = tmp_path / "idx_cli3"
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "RAY_ADDRESS": "local"}

    def run(*args, timeout=300):
        r = subprocess.run(
            [sys.executable, "-m", "vexor_ray", *args],
            capture_output=True, text=True, env=env, timeout=timeout,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout

    run("--num-cpus", "2", "build", "--input", str(pages), "--out", str(idx),
        "--waves", "1")
    shards = sorted(pages.glob("part-*.parquet"))
    pq_.write_table(generate_pages(200, seed=9).slice(0, 60), shards[0])
    run("--num-cpus", "2", "build", "--input", str(pages), "--out", str(idx),
        "--waves", "1")

    snaps = [l for l in run("snapshots", "--index", str(idx)).splitlines() if l]
    assert len(snaps) == 2 and snaps[-1].startswith("*")
    old_name = snaps[0].split()[2]

    hits = run("search", "--index", str(idx), "--query", "needledfone",
               "-k", "2", "--at", old_name, "--porcelain")
    doc = hits.splitlines()[0].split("\t")[1]

    def _json(out):  # Ray may emit log lines on stdout before the JSON
        return json.loads(out[out.find("{"):])

    diff = _json(run("snapshot-diff", "--index", str(idx),
                     "--from", old_name))
    assert diff["added"] > 0 and diff["removed"] > 0

    vac = _json(run("vacuum", "--index", str(idx), "--dry-run"))
    assert vac["dry_run"] and vac["kept_referenced"] > 0

    ex = _json(run("explain", "--index", str(idx),
                   "--query", "needledfone", "--doc", doc))
    assert ex["score"] > 0 and ex["terms"][0]["tf"] >= 1

    qf = tmp_path / "stored.txt"
    qf.write_text("needledfone\nqqqabsent zz\n")
    docs_pq = tmp_path / "docs.parquet"
    pq_.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": pa.array(["has needledfone inside", "nothing"]),
            }
        ),
        docs_pq,
    )
    out = run("percolate", "--input", str(docs_pq), "--queries", str(qf))
    assert "1\t0\tneedledfone" in out and "# 1 matches" in out
