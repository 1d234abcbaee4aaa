"""Temporal joins Ray Data lacks natively: as-of join via co-partitioning.

``asof_join_events_orders``: for every event, attach the user's most recent
order at-or-before the event time — the canonical training-data "state as
of t" join.  Ray Data has no join operator with temporal predicates, so the
standard co-partition shape is used (documented partitioning assumption:
both sides hash-partition cleanly by the key):

1. project both tables to a tagged common schema;
2. ``union`` → one ``groupby(key)`` (the only shuffle);
3. per group: sort each side by time, one vectorized ``searchsorted`` maps
   every event to its predecessor order — no per-row Python.

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

    def asof_group(g: pd.DataFrame) -> pd.DataFrame:
        evs = g[g["src"] == 0]
        ods = g[g["src"] == 1]
        if evs.empty or ods.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "o_orderkey": pd.Series([], dtype="int64"),
                    "o_totalprice": pd.Series([], dtype="float64"),
                }
            )
        # orders sorted (date asc, orderkey asc): searchsorted(side="right")
        # lands past the LAST order with date <= ts, i.e. the deterministic
        # (latest date, highest orderkey) winner is at idx-1
        ods = ods.sort_values(["t", "o_orderkey"], kind="mergesort")
        odt = ods["t"].to_numpy()
        idx = np.searchsorted(odt, evs["t"].to_numpy(), side="right") - 1
        hit = idx >= 0
        sel = ods.iloc[idx[hit]]
        return pd.DataFrame(
            {
                "event_id": evs["event_id"].to_numpy()[hit].astype("int64"),
                "user_id": evs["key"].to_numpy()[hit].astype("int64"),
                "o_orderkey": sel["o_orderkey"].to_numpy().astype("int64"),
                "o_totalprice": sel["o_totalprice"].to_numpy(),
            }
        )

    return tagged.groupby("key").map_groups(asof_group, batch_format="pandas")
