"""Index (manifest) selection — the analogue of the reference's superset
cache selection (``services/search_service.py:999-1061``).

Given several committed index manifests over possibly different corpus
subsets / configs, pick the best one for a query request: filter candidates
whose build config is compatible (same scoring constants, tokenizer and doc
builder), whose input covers the requested file set, and rank by
(coverage distance, doc_count) — the smallest compatible superset wins,
exactly the reference's "closest covering cache" idea re-expressed over
manifest metadata instead of SQLite rows.
"""

from __future__ import annotations

from pathlib import Path

from .manifest import load_manifest

_COMPAT_KEYS = ("k1", "b", "token_pattern", "doc_builder", "text_only", "term_hasher")


def compatible(manifest: dict, want: dict | None = None) -> bool:
    cfg = manifest.get("config", {})
    want = want or {}
    for key in _COMPAT_KEYS:
        if key in want and cfg.get(key) != want[key]:
            return False
    return True


def select_index(
    index_dirs: list,
    *,
    required_files: list[str] | None = None,
    want: dict | None = None,
    filesystem=None,
) -> "Path | object | None":
    """Best committed index covering ``required_files`` (or any, if None).

    Ranking: fewest extra input files beyond the requirement, then smallest
    doc_count (cheapest to query), then lexicographic dir (determinism).
    ``index_dirs`` entries may be local paths or ``storage.Store`` objects
    (``filesystem`` applies to plain-path entries).
    """
    from .storage import Store

    need = {str(f) for f in (required_files or [])}
    candidates: list[tuple[int, int, str, object]] = []
    for entry in index_dirs:
        st = Store.resolve(entry, filesystem)
        # return the caller's own notion of the winner: a Path for plain
        # local entries (historical contract), the Store otherwise
        d = entry if isinstance(entry, Store) else (
            st if filesystem is not None else Path(st.base)
        )
        try:
            manifest = load_manifest(st)
        except (FileNotFoundError, ValueError):
            continue
        if not compatible(manifest, want):
            continue
        have = set(manifest.get("input_files", []))
        if not need <= have:
            continue
        candidates.append(
            (len(have - need), manifest["stats"]["doc_count"], str(d), d)
        )
    if not candidates:
        return None
    candidates.sort()
    return candidates[0][3]
