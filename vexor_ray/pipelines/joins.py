"""Temporal joins Ray Data lacks natively: as-of join via co-partitioning.

``asof_join_events_orders``: for every event, attach the user's most recent
order at-or-before the event time — the canonical training-data "state as
of t" join.  Ray Data has no join operator with temporal predicates, so the
standard co-partition shape is used (documented partitioning assumption:
both sides hash-partition cleanly by the key):

1. project both tables to a tagged common schema;
2. ``union`` → one coarse hash-partition shuffle of the key
   (functions/groups.py — never a user-cardinality groupby);
3. per partition: ``pd.merge_asof(by=key)`` maps every event to its
   predecessor order — C kernels, no per-row or per-user Python.

Tie rule (deterministic): latest ``o_orderdate``, then highest
``o_orderkey``.  Events with no prior order are dropped (inner as-of).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def asof_join_events_orders(sf_dir: str) -> ray.data.Dataset:
    """(event_id, user_id, o_orderkey, o_totalprice) — latest order ≤ ts."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def tag_events(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch.column("user_id"),
                "t": batch.column("ts"),
                "src": pa.array(np.zeros(n, dtype=np.int8)),
                "event_id": batch.column("event_id"),
                "o_orderkey": pa.nulls(n, type=pa.int64()),
                "o_totalprice": pa.nulls(n, type=pa.float64()),
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch.column("o_custkey"),
                "t": batch.column("o_orderdate"),
                "src": pa.array(np.ones(n, dtype=np.int8)),
                "event_id": pa.nulls(n, type=pa.int64()),
                "o_orderkey": batch.column("o_orderkey"),
                "o_totalprice": batch.column("o_totalprice"),
            }
        )

    tagged = ev.map_batches(tag_events, batch_format="pyarrow", zero_copy_batch=True).union(
        od.map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
    )

    def asof_part(df: pd.DataFrame) -> pd.DataFrame:
        # one coarse partition holds MANY user keys (functions/groups.py:
        # Ray's per-group Python makes a user-keyed groupby O(#users));
        # pd.merge_asof(by="key") is the C-kernel multi-key as-of.  Right
        # side sorted (t asc, orderkey asc, stable) so "backward" picks the
        # deterministic (latest date, highest orderkey) winner.
        empty = pd.DataFrame(
            {
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "o_orderkey": pd.Series([], dtype="int64"),
                "o_totalprice": pd.Series([], dtype="float64"),
            }
        )
        evs = df.loc[df["src"] == 0, ["key", "t", "event_id"]].sort_values(
            "t", kind="mergesort"
        )
        ods = df.loc[
            df["src"] == 1, ["key", "t", "o_orderkey", "o_totalprice"]
        ].sort_values(["t", "o_orderkey"], kind="mergesort")
        if evs.empty or ods.empty:
            return empty
        m = pd.merge_asof(evs, ods, on="t", by="key", direction="backward")
        m = m.loc[m["o_orderkey"].notna()]
        if m.empty:
            return empty
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype("int64").to_numpy(),
                "user_id": m["key"].astype("int64").to_numpy(),
                "o_orderkey": m["o_orderkey"].astype("int64").to_numpy(),
                "o_totalprice": m["o_totalprice"].to_numpy(),
            }
        )

    from ..functions.groups import coarse_grouped, int_pid

    return coarse_grouped(tagged, lambda b: int_pid(b, ["key"], 64), asof_part)


def range_join_events(sf_dir: str, window_minutes: int = 60) -> ray.data.Dataset:
    """Self range join: every (event, prior event) of the same user with the
    prior event inside the ``window_minutes`` before it (inclusive), self
    excluded — the "gather a user's recent context" join of a training-data
    pipeline.

    Ray Data has no range-predicate join; each user's history co-locates
    once (coarse hash shuffle, functions/groups.py), then the interval probe
    is fully vectorized inside the partition: rows sorted by a single
    monotonic int64 composite key (dense user code x time span + offset)
    turn both window edges into two ``searchsorted`` calls, and match
    expansion is ``np.repeat`` index arithmetic — no per-event Python, no
    per-user cross product beyond the true matches.

    Partitioning assumption (documented per the task brief): the join key
    hashes cleanly; a pathologically hot user bounds work at (its events x
    its in-window events) inside one partition.
    """
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    win_us = np.int64(window_minutes) * np.int64(60_000_000)

    def range_part(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_id": pd.Series([], dtype="int64"),
                "prior_event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
            }
        )
        if df.empty:
            return empty
        keys, codes = np.unique(df["user_id"].to_numpy(), return_inverse=True)
        t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        tmin = int(t.min())
        span = int(t.max()) - tmin + int(win_us) + 2
        if span * len(keys) >= np.iinfo(np.int64).max:
            raise OverflowError("composite range-join key overflows int64")
        comp = codes.astype(np.int64) * span + (t - tmin)
        order = np.argsort(comp, kind="stable")
        comp_sorted = comp[order]
        ids = df["event_id"].astype("int64").to_numpy()
        users = df["user_id"].astype("int64").to_numpy()
        lo = np.searchsorted(comp_sorted, comp - int(win_us))
        hi = np.searchsorted(comp_sorted, comp, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return empty
        probe_idx = np.repeat(np.arange(comp.size), counts)
        starts = np.repeat(lo, counts)
        offs = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts
        )
        match_idx = order[starts + offs]
        keep = ids[match_idx] != ids[probe_idx]  # drop the self pair
        return pd.DataFrame(
            {
                "event_id": ids[probe_idx][keep],
                "prior_event_id": ids[match_idx][keep],
                "user_id": users[probe_idx][keep],
            }
        )

    from ..functions.groups import coarse_grouped, int_pid

    return coarse_grouped(ev, lambda b: int_pid(b, ["user_id"], 64), range_part)
