"""Randomized operation walk pinning the snapshot-isolation invariant:
after ANY sequence of incremental appends, tombstone deletions, and
compactions, every retained snapshot still reproduces — bit-exactly — the
search results recorded at the moment it was committed.

One seeded walk (deterministic), probe queries spanning needles, common
words, and an absent term.  This is the integration-level guarantee the
per-feature tests imply but never exercise in combination.
"""

from __future__ import annotations

import random

import pyarrow.parquet as pq

from vexor_ray.fixtures.pages import generate_pages, write_pages
from vexor_ray.index.build import BuildConfig, build_index, compact_index
from vexor_ray.index.deletes import delete_docs
from vexor_ray.index.manifest import list_manifests
from vexor_ray.query.searcher import Searcher

PROBES = ["needledfone", "needledften", "common words", "absenttermzz", "page"]


def _cfg(**kw):
    base = dict(
        num_waves=1,
        partitions_per_wave=2,
        shard_group_size=1,
        tokenize_concurrency=2,
        salt_shift=8,
        shuffle_backend="hash",
        manifest_history=50,  # retain everything: every snapshot stays pinned
    )
    base.update(kw)
    return BuildConfig(**base)


def _snapshot_state(idx):
    s = Searcher(idx)
    name = list_manifests(idx)[-1]["name"]
    state = {
        q: s.search(q, k=10, method="exact") for q in PROBES
    }
    return name, state, s.live_doc_count


def test_snapshot_walk_reproduces_every_recorded_state(
    ray_session, tmp_path
):
    rng = random.Random(20260820)
    pages = write_pages(tmp_path / "pages", 300, seed=42, rows_per_file=100)
    idx = tmp_path / "idx"
    build_index(pages, idx, _cfg())
    expected: dict[str, tuple[dict, int]] = {}
    name, state, n = _snapshot_state(idx)
    expected[name] = (state, n)

    shards = sorted(pages.glob("part-*.parquet"))
    for step in range(7):
        op = rng.choice(["append", "append", "delete", "compact"])
        if op == "append":
            sh = rng.choice(shards)
            other = generate_pages(200, seed=1000 + step)
            pq.write_table(other.slice(rng.randrange(50), 100), sh)
            build_index(pages, idx, _cfg())
        elif op == "delete":
            s = Searcher(idx)
            hits = s.search("page", k=5, method="exact")
            if not hits:
                continue
            url = s.lookup_urls([hits[0][0]])[hits[0][0]]
            delete_docs(idx, [url])
        else:
            compact_index(pages, idx, _cfg())
        name, state, n = _snapshot_state(idx)
        expected[name] = (state, n)

    # every retained snapshot reproduces its recorded state exactly
    hist = list_manifests(idx)
    assert len(hist) >= len(expected)  # compaction may add refresh commits
    checked = 0
    for e in hist:
        if e["name"] not in expected:
            continue  # intermediate compaction-refresh commit: not recorded
        want_state, want_n = expected[e["name"]]
        pinned = Searcher(idx, manifest_name=e["name"])
        assert pinned.live_doc_count == want_n, e["name"]
        for q, want in want_state.items():
            assert pinned.search(q, k=10, method="exact") == want, (
                e["name"],
                q,
            )
        checked += 1
    assert checked == len(expected) and checked >= 6
