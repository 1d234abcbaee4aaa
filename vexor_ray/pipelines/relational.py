"""Generic relational building blocks demonstrated over the TPC-H-ish tables.

These are the Dataset primitives the index engine is composed of (groupby
aggregate, hash join, sort+limit, filter, distinct), each as a standalone
oracle-checkable pipeline.  Aggregates are pre-combined per batch where the
pattern matters (``agg_lineitem`` uses map-side partial aggregation before
the small groupby — the partial+final shape from SURVEY.md §2.5 A6).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def agg_lineitem(sf_dir: str) -> pa.Table:
    """TPC-H Q1-shaped grouped aggregate with map-side partial combine."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["revenue"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(
                sum_qty=("l_quantity", "sum"),
                sum_price=("l_extendedprice", "sum"),
                revenue=("revenue", "sum"),
                n_rows=("l_quantity", "size"),
            )
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_price", alias_name="sum_price"),
            Sum("revenue", alias_name="revenue"),
            Sum("n_rows", alias_name="n_rows"),
        )
        .to_pandas()
    )
    out["sum_qty"] = out["sum_qty"].round(2)
    out["sum_price"] = out["sum_price"].round(2)
    out["revenue"] = out["revenue"].round(2)
    out["n_rows"] = out["n_rows"].astype("int64")
    out = out.sort_values(["l_returnflag", "l_linestatus"])
    return pa.Table.from_pandas(out, preserve_index=False)


def sort_topk_orders(sf_dir: str, k: int = 10) -> pa.Table:
    """Top-k orders by (totalprice desc, orderkey asc) via distributed sort."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    top = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)
    tbl = top.to_pandas()
    tbl["o_totalprice"] = tbl["o_totalprice"].round(2)
    return pa.Table.from_pandas(tbl, preserve_index=False)


def filter_highvalue(sf_dir: str) -> pa.Table:
    """Vectorized predicate filter + projection, counted per orderstatus."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(100_000.0))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = ds.groupby("o_orderstatus").aggregate(Count(alias_name="n")).to_pandas()
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("o_orderstatus"), preserve_index=False
    )


def join_orders_customers(sf_dir: str) -> pa.Table:
    """Hash join orders ⋈ customer → revenue per market segment.

    Customer is the small side → broadcast via ``ray.put`` and mapped in
    (no shuffle), the guide's dimension-table pattern.
    """
    import numpy as np
    import ray

    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .to_pandas()
        .set_index("c_custkey")["c_mktsegment"]
    )
    cust_ref = ray.put(cust)

    def attach(batch: pa.Table) -> pa.Table:
        cmap = ray.get(cust_ref)
        df = batch.to_pandas()
        df["c_mktsegment"] = df["o_custkey"].map(cmap)
        return pa.Table.from_pandas(
            df[["c_mktsegment", "o_totalprice"]], preserve_index=False
        )

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = ds.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        joined.groupby("c_mktsegment")
        .aggregate(
            Sum("o_totalprice", alias_name="total_price"),
            Count(alias_name="n_orders"),
        )
        .to_pandas()
    )
    out["total_price"] = out["total_price"].round(2)
    out["n_orders"] = out["n_orders"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("c_mktsegment"), preserve_index=False
    )


def distinct_suppliers(sf_dir: str) -> pa.Table:
    """Distinct (set-op) demo: suppliers appearing in lineitem, counted."""
    ds = _read(sf_dir, "lineitem", ["l_suppkey"])
    n = len(ds.unique("l_suppkey"))
    return pa.table({"n_distinct_suppliers": pa.array([n], type=pa.int64())})


def events_window_agg(sf_dir: str) -> pa.Table:
    """Stream-shaped: per-user tumbling 1-hour windows over the events log.

    Ray Data has no watermarks; the events table is treated as a partitioned
    ordered log — groupby(user) and window within the sorted group
    (``map_groups``).  Output: (user_id, window_start, n_events, sum_value).
    """
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def windows(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        win = g["ts"].dt.floor("1h")
        out = (
            g.assign(window_start=win)
            .groupby("window_start", as_index=False)
            .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        )
        out.insert(0, "user_id", g["user_id"].iloc[0])
        out["sum_value"] = out["sum_value"].round(6)
        out["n_events"] = out["n_events"].astype("int64")
        return out

    out = (
        ds.groupby("user_id")
        .map_groups(windows, batch_format="pandas")
        .to_pandas()
        .sort_values(["user_id", "window_start"])
    )
    return pa.Table.from_pandas(out, preserve_index=False)
