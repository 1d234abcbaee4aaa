"""Snapshot diff: which documents appeared/disappeared between two
retained snapshots (``index/manifest.py`` history).

Scale shape: the docs checkpoint is partitioned per shard group and
snapshots SHARE the files of unchanged groups, so the diff reads ONLY the
files unique to each side — an incremental append that touched 1 of 10⁴
groups diffs by reading 2 groups, not the corpus.  Url identity is doc
identity (the build contract), so the diff is a distributed anti-join of
url sets: tag each side, one coarse url-hash shuffle, per-partition pandas
set logic — no driver-side url sets.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.groups import coarse_grouped, str_pid
from .manifest import load_manifest
from .storage import Store


def _tag(flag: int):
    def fn(batch: pa.Table) -> pa.Table:
        import numpy as np

        return pa.table(
            {
                "url": batch.column("url").cast(pa.large_string()),
                "side": pa.array(
                    np.full(batch.num_rows, flag, dtype=np.int8)
                ),
            }
        )

    return fn


def snapshot_diff(
    index_dir,
    from_name: str | None = None,
    to_name: str | None = None,
    *,
    filesystem=None,
    sample: int = 5,
) -> dict:
    """Docs added/removed going ``from_name`` → ``to_name``.

    Either name may be None (the committed pointer).  Returns counts, up
    to ``sample`` example urls per side, and both snapshots' live/deleted
    stats.  Only delta files are read (see module docstring)."""
    store = Store.resolve(index_dir, filesystem)
    man_a = load_manifest(store, at=from_name)
    man_b = load_manifest(store, at=to_name)
    files_a = list(man_a.get("docs_files", []))
    files_b = list(man_b.get("docs_files", []))
    shared = set(files_a) & set(files_b)
    only_a = [f for f in files_a if f not in shared]
    only_b = [f for f in files_b if f not in shared]

    def side(files: list[str], flag: int) -> ray.data.Dataset | None:
        if not files:
            return None
        return ray.data.read_parquet(
            files, columns=["url"], filesystem=store.fs
        ).map_batches(_tag(flag), batch_format="pyarrow", zero_copy_batch=True)

    ds_a = side(only_a, 0)
    ds_b = side(only_b, 1)
    added = removed = 0
    added_sample: list[str] = []
    removed_sample: list[str] = []
    if ds_a is not None or ds_b is not None:
        if ds_a is not None and ds_b is not None:
            both = ds_a.union(ds_b)
        else:
            both = ds_a if ds_a is not None else ds_b

        def diff_part(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("url", sort=False)["side"].agg(["min", "max"])
            one_side = g[g["min"] == g["max"]]
            return pd.DataFrame(
                {
                    "url": one_side.index.to_numpy(),
                    "side": one_side["max"].to_numpy(),
                }
            )

        out = coarse_grouped(
            both, lambda b: str_pid(b, "url", 64), diff_part
        )
        for rb in out.iter_batches(batch_format="pyarrow"):
            sides = rb.column("side").to_numpy()
            urls = rb.column("url")
            added += int((sides == 1).sum())
            removed += int((sides == 0).sum())
            for u, s in zip(urls.to_pylist(), sides):
                bucket = added_sample if s == 1 else removed_sample
                if len(bucket) < sample:
                    bucket.append(u)

    def _live(man: dict) -> dict:
        stats = man.get("stats", {})
        deletes = man.get("deletes") or {}
        return {
            "doc_count": stats.get("doc_count"),
            "n_deleted": int(deletes.get("n_deleted", 0)),
            "snapshot_seq": man.get("snapshot_seq"),
        }

    return {
        "from": _live(man_a),
        "to": _live(man_b),
        "added": added,
        "removed": removed,
        "added_sample": sorted(added_sample),
        "removed_sample": sorted(removed_sample),
        "files_read": len(only_a) + len(only_b),
        "files_shared": len(shared),
    }
