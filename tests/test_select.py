"""Manifest selection (superset cache analogue) — pure-Python tests."""

from __future__ import annotations

import json

from vexor_ray.index.select import compatible, select_index


def _write_manifest(d, files, doc_count, **cfg):
    d.mkdir(parents=True, exist_ok=True)
    base_cfg = {
        "k1": 1.5,
        "b": 0.75,
        "token_pattern": "[A-Za-z0-9_]+",
        "doc_builder": "url_text",
        "text_only": False,
        "term_hasher": "pandas-siphash13-v1",
    }
    base_cfg.update(cfg)
    (d / "manifest.json").write_text(
        json.dumps(
            {
                "format_version": 2,
                "config": base_cfg,
                "stats": {"doc_count": doc_count},
                "input_files": files,
                "partitions": [],
            }
        )
    )


def test_select_smallest_covering_superset(tmp_path):
    a, b, c = tmp_path / "a", tmp_path / "b", tmp_path / "c"
    _write_manifest(a, ["f1", "f2"], 100)
    _write_manifest(b, ["f1", "f2", "f3", "f4"], 200)
    _write_manifest(c, ["f1"], 50)
    # need f1+f2 → a (exact cover) beats b (superset) and c (insufficient)
    assert select_index([a, b, c], required_files=["f1", "f2"]) == a
    # need f1..f3 → only b covers
    assert select_index([a, b, c], required_files=["f1", "f2", "f3"]) == b
    # need f9 → none
    assert select_index([a, b, c], required_files=["f9"]) is None


def test_select_filters_incompatible_config(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    _write_manifest(a, ["f1"], 100, k1=1.2)
    _write_manifest(b, ["f1"], 100)
    got = select_index([a, b], required_files=["f1"], want={"k1": 1.5})
    assert got == b
    assert not compatible(json.loads((a / "manifest.json").read_text()), {"k1": 1.5})


def test_select_skips_uncommitted(tmp_path):
    a = tmp_path / "a"
    a.mkdir()
    assert select_index([a], required_files=[]) is None
