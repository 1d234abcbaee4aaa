"""Generic relational building blocks demonstrated over the TPC-H-ish tables.

These are the Dataset primitives the index engine is composed of (groupby
aggregate, hash join, sort+limit, filter, distinct), each as a standalone
oracle-checkable pipeline.  Aggregates are pre-combined per batch where the
pattern matters (``agg_lineitem`` uses map-side partial aggregation before
the small groupby — the partial+final shape from SURVEY.md §2.5 A6).
"""

from __future__ import annotations

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
        # pure-Arrow map-side combine: no pandas conversion in the hot path
        revenue = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        t = batch.append_column("revenue", revenue)
        g = pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("l_quantity", "sum"),
                ("l_extendedprice", "sum"),
                ("revenue", "sum"),
                ("l_quantity", "count"),
            ]
        )
        return pa.table(
            {
                "l_returnflag": g["l_returnflag"],
                "l_linestatus": g["l_linestatus"],
                "sum_qty": g["l_quantity_sum"],
                "sum_price": g["l_extendedprice_sum"],
                "revenue": g["revenue_sum"],
                "n_rows": pc.cast(g["l_quantity_count"], pa.int64()),
            }
        )

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


def events_hopping_agg(sf_dir: str) -> pa.Table:
    """Hopping windows: 1-hour windows sliding every 30 minutes.

    Each event lands in exactly two windows (``floor30(t)`` and
    ``floor30(t) - 30min``); the explode happens map-side with the same
    partial-combine shape as the tumbling aggregate.
    """
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        w1 = pc.floor_temporal(batch["ts"], multiple=30, unit="minute")
        w0 = pc.subtract(w1, pa.scalar(1_800_000_000, type=pa.duration("us")))
        t = pa.concat_tables(
            [
                pa.table(
                    {
                        "user_id": batch["user_id"],
                        "window_start": w,
                        "value": batch["value"],
                    }
                )
                for w in (w0, w1)
            ]
        ).combine_chunks()
        g = pa.TableGroupBy(t, ["user_id", "window_start"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )
        return pa.table(
            {
                "user_id": g["user_id"],
                "window_start": g["window_start"],
                "sum_value": g["value_sum"],
                "n_events": pc.cast(g["value_count"], pa.int64()),
            }
        )

    from ..functions.groups import coarse_grouped, int_pid

    def final(df):
        return df.groupby(["user_id", "window_start"], as_index=False).agg(
            sum_value=("sum_value", "sum"), n_events=("n_events", "sum")
        )

    # (user, window) cardinality grows with the log: finish inside coarse
    # hash partitions (functions/groups.py), not a Ray keyed groupby
    out = coarse_grouped(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        lambda b: int_pid(b, ["user_id"], 64),
        final,
    ).to_pandas()
    out = out.sort_values(["user_id", "window_start"])
    out["sum_value"] = out["sum_value"].round(6)
    out["n_events"] = out["n_events"].astype("int64")
    out = out[["user_id", "window_start", "n_events", "sum_value"]]
    return pa.Table.from_pandas(out, preserve_index=False)


def hash_sample_documents(sf_dir: str, pct: int = 10) -> ray.data.Dataset:
    """Deterministic ``pct``% sample: md5(doc_id) bucket < pct.

    The seedable, shuffle-free sampling shape for 100 TB runs — any worker
    reproduces membership locally, and the SQL oracle checks it exactly.
    """
    from ..functions.dedup import md5_u64

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        keep = [md5_u64(str(d).encode()) % 100 < pct for d in ids]
        return batch.filter(pa.array(keep))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


def sample_n_documents(sf_dir: str, n: int = 50) -> pa.Table:
    """EXACT-size uniform sample: the ``n`` docs with the smallest
    md5(doc_id) — ``hash_sample``'s fixed-count companion (a percentage
    sample can't promise "give me exactly 100k eval docs").

    Shape: per-batch partial top-n by hash (tiny), one driver merge —
    no sort, no shuffle, any worker reproduces membership locally.
    """
    import numpy as np

    from ..functions.dedup import md5_u64

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        if not ids:
            return batch.append_column("h", pa.array([], type=pa.uint64()))
        hs = np.fromiter(
            (md5_u64(str(d).encode()) for d in ids),
            dtype=np.uint64,
            count=len(ids),
        )
        order = np.argsort(hs, kind="stable")[:n]
        out = batch.take(pa.array(order))
        return out.append_column("h", pa.array(hs[order], type=pa.uint64()))

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    parts = parts.sort_values("h", kind="mergesort").head(n)
    return pa.Table.from_pandas(
        parts.drop(columns=["h"]).sort_values("doc_id").reset_index(drop=True),
        preserve_index=False,
    )


def events_window_agg(sf_dir: str) -> pa.Table:
    """Stream-shaped: per-user tumbling 1-hour windows over the events log.

    Ray Data has no watermarks; the events table is treated as a partitioned
    ordered log.  The window key is computed map-side (``floor_temporal``)
    with a per-batch partial combine, then one small ``groupby`` finishes —
    no per-user ``map_groups``, so a hot user cannot skew a reducer.
    Output: (user_id, window_start, n_events, sum_value).
    """
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        # map-side combine on (user, hour): the shuffle moves one row per
        # (user, window) per batch, not one per event, and a hot user cannot
        # skew a reducer (no per-user map_groups)
        win = pc.floor_temporal(batch["ts"], unit="hour")
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "window_start": win,
                "value": batch["value"],
            }
        )
        g = pa.TableGroupBy(t, ["user_id", "window_start"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )
        return pa.table(
            {
                "user_id": g["user_id"],
                "window_start": g["window_start"],
                "sum_value": g["value_sum"],
                "n_events": pc.cast(g["value_count"], pa.int64()),
            }
        )

    from ..functions.groups import coarse_grouped, int_pid

    def final(df):
        return df.groupby(["user_id", "window_start"], as_index=False).agg(
            sum_value=("sum_value", "sum"), n_events=("n_events", "sum")
        )

    # (user, window) cardinality grows with the log: finish inside coarse
    # hash partitions (functions/groups.py), not a Ray keyed groupby
    out = coarse_grouped(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        lambda b: int_pid(b, ["user_id"], 64),
        final,
    ).to_pandas()
    out = out.sort_values(["user_id", "window_start"])
    out["sum_value"] = out["sum_value"].round(6)
    out["n_events"] = out["n_events"].astype("int64")
    out = out[["user_id", "window_start", "n_events", "sum_value"]]
    return pa.Table.from_pandas(out, preserve_index=False)


def events_session_agg(sf_dir: str, gap_minutes: int = 30) -> pa.Table:
    """Session windows: per-user gap-based sessionization (gap > 30 min).

    The one window type that cannot be computed map-side (a session's extent
    depends on every event of the user), so each user's full history must
    co-locate once: coarse hash partitions on user_id (functions/groups.py),
    then a fully vectorized session assignment inside the partition — sort by
    (user, ts), new-session flag where the user changes or the gap exceeds
    the threshold, session id = cumsum of flags.  One shuffle total; a hot
    user costs one numpy pass, not a Python loop.
    Output: (user_id, session_start, n_events, sum_value).
    """
    import numpy as np

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    gap_us = gap_minutes * 60_000_000

    def sessions(df):
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        user = df["user_id"].to_numpy()
        new = np.ones(len(df), dtype=np.int64)
        if len(df) > 1:
            new[1:] = (user[1:] != user[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        df = df.assign(_sid=np.cumsum(new))
        return df.groupby(["user_id", "_sid"], as_index=False).agg(
            session_start=("ts", "min"),
            n_events=("ts", "count"),
            sum_value=("value", "sum"),
        )[["user_id", "session_start", "n_events", "sum_value"]]

    from ..functions.groups import coarse_grouped, int_pid

    out = coarse_grouped(
        ds, lambda b: int_pid(b, ["user_id"], 64), sessions
    ).to_pandas()
    out = out.sort_values(["user_id", "session_start"])
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(6)
    return pa.Table.from_pandas(out, preserve_index=False)


def top_docs_per_lang(sf_dir: str, k: int = 3) -> pa.Table:
    """Grouped top-k: the k largest documents per language.

    Partial top-k per batch (each batch keeps at most k rows per lang seen
    in it) then a tiny driver-side final — the shuffle-free grouped-top-k
    shape; group count is bounded, per-group candidate volume is k × #blocks
    regardless of corpus size.  Tie-break (n_chars desc, doc_id asc).
    Output: (lang, rank, doc_id, n_chars).
    """
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["lang", "n_chars", "doc_id"],
                            ascending=[True, False, True], kind="mergesort")
        return pa.Table.from_pandas(df.groupby("lang").head(k), preserve_index=False)

    cand = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    df = cand.to_pandas()
    df = df.sort_values(["lang", "n_chars", "doc_id"],
                        ascending=[True, False, True], kind="mergesort")
    top = df.groupby("lang").head(k).reset_index(drop=True)
    top["rank"] = top.groupby("lang").cumcount() + 1
    top["rank"] = top["rank"].astype("int64")
    return pa.Table.from_pandas(
        top[["lang", "rank", "doc_id", "n_chars"]], preserve_index=False
    )


def price_quantiles(sf_dir: str, qs: tuple = (0.5, 0.9, 0.99)) -> pa.Table:
    """Exact distributed quantiles without a global sort.

    Three bounded passes instead of an all-to-all sort: (1) count + min/max
    partials; (2) a 4096-bin histogram partial per batch (tiny fixed-size
    reduce); (3) fetch only the rows of the bins that contain the target
    ranks (≈ n/4096 rows per quantile) and select exactly.  Quantile q =
    the element at zero-based rank floor(q*(n-1)) of the ascending sort —
    the returned value is an existing datum, so the oracle compare is exact
    with no rounding.
    """
    import numpy as np

    col = "l_extendedprice"
    ds = _read(sf_dir, "lineitem", [col])

    def minmax(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "lo": pa.array([float(v.min())] if v.size else [np.inf]),
                "hi": pa.array([float(v.max())] if v.size else [-np.inf]),
                "n": pa.array([int(v.size)], type=pa.int64()),
            }
        )

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    lo, hi, n = mm["lo"].min(), mm["hi"].max(), int(mm["n"].sum())
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    ranks = [int(np.floor(q * (n - 1))) for q in qs]
    nbins = 4096
    edges = np.linspace(lo, hi, nbins + 1)

    def hist(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        h, _ = np.histogram(v, bins=edges)
        return pa.table({"bin": pa.array(np.arange(nbins), type=pa.int64()),
                         "cnt": pa.array(h, type=pa.int64())})

    hp = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
    counts = np.zeros(nbins, dtype=np.int64)
    np.add.at(counts, hp["bin"].to_numpy(), hp["cnt"].to_numpy())
    cum = np.cumsum(counts)
    # target bin per rank: first bin whose cumulative count exceeds the rank
    target_bins = sorted({int(np.searchsorted(cum, r + 1)) for r in ranks})
    lo_edges = edges[target_bins]
    hi_edges = edges[[b + 1 for b in target_bins]]
    is_last = np.array([b == nbins - 1 for b in target_bins])

    def in_bins(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        keep = np.zeros(v.shape, dtype=bool)
        for blo, bhi, last in zip(lo_edges, hi_edges, is_last):
            m = (v >= blo) & ((v <= bhi) if last else (v < bhi))
            keep |= m
        return pa.table({col: pa.array(v[keep])})

    cand = np.sort(
        ds.map_batches(in_bins, batch_format="pyarrow").to_pandas()[col].to_numpy()
    )
    # rows below each target bin are accounted by the cumulative histogram
    out_q, out_v = [], []
    for q, r in zip(qs, ranks):
        b = int(np.searchsorted(cum, r + 1))
        below = int(cum[b - 1]) if b > 0 else 0
        # offset of this bin's values within the concatenated candidate array
        off = 0
        for tb in target_bins:
            if tb == b:
                break
            off += int(counts[tb])
        out_q.append(float(q))
        out_v.append(float(cand[off + (r - below)]))
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.float64())})


def group_quantiles(
    sf_dir: str, qs: tuple = (0.5, 0.9)
) -> pa.Table:
    """Exact per-group quantiles: l_extendedprice by l_returnflag.

    Same rank definition as ``price_quantiles`` (element at zero-based rank
    floor(q*(n-1)) of the ascending sort) applied per group.  Groups
    co-locate via one coarse hash shuffle; the per-group selection is a
    numpy sort inside the partition — returned values are existing data, so
    the oracle compare is exact with no rounding.
    """
    import numpy as np

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def part(df):
        rows = []
        for flag, g in df.groupby("l_returnflag"):
            v = np.sort(g["l_extendedprice"].to_numpy())
            for q in qs:
                rows.append((flag, float(q), float(v[int(np.floor(q * (len(v) - 1)))])))
        import pandas as pd

        return pd.DataFrame(rows, columns=["l_returnflag", "q", "value"])

    from ..functions.groups import coarse_grouped, str_pid

    out = coarse_grouped(
        ds, lambda b: str_pid(b, "l_returnflag", 64), part
    ).to_pandas()
    out = out.sort_values(["l_returnflag", "q"])
    return pa.Table.from_pandas(out, preserve_index=False)


def user_moving_avg(sf_dir: str, window: int = 3) -> pa.Table:
    """Ordered window function: per-user moving average over the last
    ``window`` events (ROWS window-1 PRECEDING .. CURRENT ROW).

    Each user's ordered history co-locates once (coarse hash partitions);
    inside the partition the sliding mean is one cumsum pass with per-user
    boundary resets — no per-user Python, no pandas groupby.rolling.
    Deterministic order: (ts, event_id).  Rounded 6dp (windowed-sum float
    association differs between engines).
    """
    import numpy as np

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def part(df):
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        user = df["user_id"].to_numpy()
        v = df["value"].to_numpy().astype(np.float64)
        n = len(df)
        idx = np.arange(n)
        # first row index of each user's run, broadcast per row
        starts = np.flatnonzero(np.r_[True, user[1:] != user[:-1]])
        run_len = np.diff(np.r_[starts, n])
        first = np.repeat(starts, run_len)
        lo = np.maximum(idx - (window - 1), first)
        csum = np.concatenate(([0.0], np.cumsum(v)))
        s = csum[idx + 1] - csum[lo]
        cnt = idx - lo + 1
        import pandas as pd

        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "user_id": user,
                "mov_avg": np.round(s / cnt, 6),
            }
        )

    from ..functions.groups import coarse_grouped, int_pid

    out = coarse_grouped(ds, lambda b: int_pid(b, ["user_id"], 64), part).to_pandas()
    out = out.sort_values("event_id")
    return pa.Table.from_pandas(out, preserve_index=False)


def event_gaps(sf_dir: str) -> pa.Table:
    """LAG window function: per-user gap (µs) to the previous event.

    Same coarse-hash-partition shape as ``user_moving_avg`` (each user's
    ordered history co-locates once; the gap is one vectorized diff with
    per-user boundary masking — first event of a user gets gap = -1, the
    SQL twin's COALESCE sentinel for LAG's NULL).  Deterministic order:
    (ts, event_id)."""
    import numpy as np

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def part(df):
        import pandas as pd

        if df.empty:
            return pd.DataFrame(
                {"event_id": [], "user_id": [], "gap_us": []}
            ).astype({"event_id": "int64", "user_id": "int64", "gap_us": "int64"})
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        user = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        gap = np.empty(len(df), dtype=np.int64)
        gap[0] = -1
        if len(df) > 1:
            gap[1:] = ts[1:] - ts[:-1]
            gap[1:][user[1:] != user[:-1]] = -1
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "user_id": user,
                "gap_us": gap,
            }
        )

    from ..functions.groups import coarse_grouped, int_pid

    out = coarse_grouped(ds, lambda b: int_pid(b, ["user_id"], 64), part).to_pandas()
    out = out.sort_values("event_id")
    return pa.Table.from_pandas(out, preserve_index=False)


_STRATA_PCT = {"en": 5, "de": 10, "zh": 20, "fr": 30, "es": 40}


def stratified_sample_documents(
    sf_dir: str,
    rates: dict[str, int] | None = None,
    default_pct: int = 50,
) -> ray.data.Dataset:
    """Stratified deterministic sampling: per-stratum (lang) hash rates.

    Same shuffle-free md5-bucket membership as ``hash_sample_documents``
    but with a different keep-rate per stratum — the standard shape for
    rebalancing a web corpus by language/domain without a global pass
    (any worker decides membership locally; exactly reproducible in SQL).
    """
    from ..functions.dedup import md5_u64

    rates = dict(_STRATA_PCT if rates is None else rates)
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        langs = batch.column("lang").to_pylist()
        keep = [
            md5_u64(str(d).encode()) % 100 < rates.get(lg, default_pct)
            for d, lg in zip(ids, langs)
        ]
        return batch.filter(pa.array(keep))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


def source_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-source (the web-crawl "domain" analogue) corpus statistics:
    ``(source, n_docs, n_langs, total_chars, avg_chars)``.

    Grouped by a corpus-growing string key → coarse hash partitions
    (functions/groups.py), exact aggregates via pandas C kernels inside
    each partition; one shuffle of narrow projected rows.
    """
    import pandas as pd

    from ..functions.groups import coarse_grouped, str_pid
    from ..functions.textstats import _round6_half_up

    ds = _read(sf_dir, "documents", ["source", "lang", "n_chars"])

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", as_index=False).agg(
            n_docs=("n_chars", "size"),
            n_langs=("lang", "nunique"),
            total_chars=("n_chars", "sum"),
        )
        g["avg_chars"] = [
            _round6_half_up(t / n)
            for t, n in zip(g["total_chars"].tolist(), g["n_docs"].tolist())
        ]
        return g.astype(
            {"n_docs": "int64", "n_langs": "int64", "total_chars": "int64"}
        )

    return coarse_grouped(ds, lambda b: str_pid(b, "source", 64), agg)


def customers_without_orders(
    sf_dir: str, min_totalprice: float = 300_000.0
) -> ray.data.Dataset:
    """Distributed anti-join: customers with no order above a price floor.

    Tagged-union shape (the same one the as-of join uses): both sides
    project to narrow (key, payload, side) rows, ONE coarse hash shuffle
    co-locates every key, and the anti-join inside each partition is a
    vectorized ``isin`` — no broadcast of the (potentially huge) probe
    side, no driver-side id set.  The probe side is filtered at the read
    (predicate before the shuffle), the general semi/anti-join shape.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from ..functions.groups import coarse_grouped, int_pid

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    ords = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(
            pc.greater(t["o_totalprice"], pa.scalar(min_totalprice))
        ).select(["o_custkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def tag_cust(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch.column("c_custkey").cast(pa.int64()),
                "c_mktsegment": batch.column("c_mktsegment"),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    def tag_ord(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch.column("o_custkey").cast(pa.int64()),
                "c_mktsegment": pa.array([""] * n, type=pa.string()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    tagged = cust.map_batches(
        tag_cust, batch_format="pyarrow", zero_copy_batch=True
    ).union(ords.map_batches(tag_ord, batch_format="pyarrow", zero_copy_batch=True))

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        has_order = df.loc[df["side"] == 1, "key"].unique()
        left = df[df["side"] == 0]
        out = left.loc[~left["key"].isin(has_order), ["key", "c_mktsegment"]]
        return out.rename(columns={"key": "c_custkey"}).astype(
            {"c_custkey": "int64"}
        )

    return coarse_grouped(tagged, lambda b: int_pid(b, ["key"], 64), anti)


def pack_sequences(
    sf_dir: str, capacity: int = 2048, n_ranges: int = 64
) -> ray.data.Dataset:
    """Sequence packing: assign docs (in doc_id order) to fixed token-budget
    bins — ``bin_id = exclusive_prefix_sum(n_tokens) // capacity``.

    The LM-training packing step (documents streamed in order into
    ~capacity-token shards), and the repo's demonstration of a **global
    ordered prefix sum** without a global sort: doc_ids partition into
    contiguous ranges, pass 1 reduces per-range token sums (tiny R-row
    table → driver computes exclusive range offsets), pass 2 cumsums
    inside each co-located range and adds its offset.  Both passes move
    only (doc_id, n_tokens) int pairs.
    """
    from ..functions.textstats import token_count_batch

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    toks = docs.map_batches(
        token_count_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return pack_token_table(toks, capacity=capacity, n_ranges=n_ranges)


def pack_token_table(
    toks: ray.data.Dataset, *, capacity: int, n_ranges: int = 64
) -> ray.data.Dataset:
    """Global ordered prefix-sum packing over a (doc_id, n_tokens) table.

    doc_ids need not be dense (gaps from upstream filtering are fine):
    ranges partition the id SPACE, so a range is just a contiguous id
    interval whose rows co-locate; bins come only from global prefix sums.
    """
    import numpy as np
    import pandas as pd

    from ..functions.groups import coarse_grouped, int_pid

    toks = toks.materialize()  # two passes below; never recompute upstream
    if toks.count() == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_tokens": pa.array([], type=pa.int64()),
                    "bin_id": pa.array([], type=pa.int64()),
                }
            )
        )
    max_id = int(toks.max("doc_id"))
    range_size = max(1, -(-(max_id + 1) // n_ranges))  # ceil over the id space

    def add_range(batch: pa.Table) -> pa.Table:
        rid = batch.column("doc_id").to_numpy() // range_size
        return batch.append_column("range_id", pa.array(rid, type=pa.int64()))

    # pass 1: per-range token sums (R rows) -> exclusive offsets on driver
    def range_sums(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("range_id", as_index=False)["n_tokens"].sum()

    sums = coarse_grouped(
        toks.map_batches(add_range, batch_format="pyarrow", zero_copy_batch=True),
        lambda b: int_pid(b, ["range_id"], 64),
        range_sums,
    ).to_pandas()
    sums = sums.sort_values("range_id")
    offsets = dict(
        zip(
            sums["range_id"].tolist(),
            np.concatenate(([0], np.cumsum(sums["n_tokens"].to_numpy())[:-1])).tolist(),
        )
    )

    # pass 2: within-range ordered cumsum + range offset -> bin ids
    def assign_bins(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort")
        excl = df.groupby("range_id")["n_tokens"].cumsum() - df["n_tokens"]
        start = excl.to_numpy() + np.array(
            [offsets[r] for r in df["range_id"].tolist()], dtype=np.int64
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_tokens": df["n_tokens"].to_numpy(),
                "bin_id": start // capacity,
            }
        ).astype({"doc_id": "int64", "n_tokens": "int64", "bin_id": "int64"})

    return coarse_grouped(
        toks.map_batches(add_range, batch_format="pyarrow", zero_copy_batch=True),
        lambda b: int_pid(b, ["range_id"], 64),
        assign_bins,
    )


def cap_per_source(sf_dir: str, cap: int = 10) -> ray.data.Dataset:
    """Per-domain capping: keep at most ``cap`` documents per source,
    chosen by deterministic hash order (md5(doc_id), doc_id) — the web-
    corpus rebalancing step that stops one huge domain from dominating.

    One coarse string-keyed shuffle; ranking inside each partition is a
    pandas C-kernel groupby-rank, never per-source Python.
    """
    import pandas as pd

    from ..functions.dedup import md5_u64
    from ..functions.groups import coarse_grouped, str_pid

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["h"] = [md5_u64(str(d).encode()) for d in df["doc_id"].tolist()]
        df = df.sort_values(["source", "h", "doc_id"], kind="mergesort")
        rnk = df.groupby("source").cumcount()
        return df.loc[rnk < cap, ["doc_id", "source"]].astype({"doc_id": "int64"})

    return coarse_grouped(ds, lambda b: str_pid(b, "source", 64), pick)


def training_export(sf_dir: str, capacity: int = 2048) -> ray.data.Dataset:
    """Flagship training-data composition: clean → semi-join → pack.

    ``clean_corpus`` (quality filter ∧ exact-dup keep-first ∧ near-dup
    canonical) produces the surviving doc_id keep-list; a distributed
    tagged-union semi-join restricts the (doc_id, n_tokens) table to
    survivors (narrow int rows, one coarse hash shuffle — no broadcast of
    the corpus-sized keep-list); the survivors pack into fixed
    token-budget bins in doc_id order via the global-prefix-sum packer.
    Output: (doc_id, n_tokens, bin_id) — the shard assignment a training
    run would write.
    """
    import numpy as np
    import pandas as pd

    from ..functions.dedup import clean_corpus
    from ..functions.groups import coarse_grouped, int_pid
    from ..functions.textstats import token_count_batch

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    keep = clean_corpus(docs)

    toks = docs.map_batches(
        token_count_batch, batch_format="pyarrow", zero_copy_batch=True
    )

    def tag_tok(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_tokens": batch.column("n_tokens").cast(pa.int64()),
                "side": pa.array(
                    np.zeros(batch.num_rows, dtype=np.int8)
                ),
            }
        )

    def tag_keep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_tokens": pa.array(
                    np.zeros(batch.num_rows, dtype=np.int64)
                ),
                "side": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
            }
        )

    tagged = toks.map_batches(
        tag_tok, batch_format="pyarrow", zero_copy_batch=True
    ).union(keep.map_batches(tag_keep, batch_format="pyarrow", zero_copy_batch=True))

    def semi(df: pd.DataFrame) -> pd.DataFrame:
        keep_ids = df.loc[df["side"] == 1, "doc_id"].unique()
        left = df[df["side"] == 0]
        out = left.loc[left["doc_id"].isin(keep_ids), ["doc_id", "n_tokens"]]
        return out.astype({"doc_id": "int64", "n_tokens": "int64"})

    survivors = coarse_grouped(tagged, lambda b: int_pid(b, ["doc_id"], 64), semi)
    return pack_token_table(survivors, capacity=capacity)


def events_json_agg(sf_dir: str) -> pa.Table:
    """JSON-payload extraction + aggregate: parse ``props`` (a JSON string
    column), pull the numeric ``k`` field, aggregate per event_type.

    The semi-structured-column shape (SURVEY §2.8 F8 applied to DATA, not
    just config): parse map-side with the stdlib C json parser per batch,
    combine partials per batch (pure Arrow), finish with a tiny groupby —
    at 100 TB the per-row parse swaps for a simdjson-class kernel, the
    shuffle shape is unchanged (one row per (batch, event_type)).
    """
    import json as _json

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        ks = pa.array(
            [
                _json.loads(p)["k"] if p else None
                for p in batch.column("props").to_pylist()
            ],
            type=pa.int64(),
        )
        t = pa.table({"event_type": batch.column("event_type"), "k": ks})
        g = pa.TableGroupBy(t, ["event_type"]).aggregate(
            [("k", "sum"), ("k", "max"), ("k", "count")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "sum_k": g["k_sum"],
                "max_k": g["k_max"],
                "n": pc.cast(g["k_count"], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        partials.groupby("event_type")
        .aggregate(
            Sum("sum_k", alias_name="sum_k"),
            Max("max_k", alias_name="max_k"),
            Sum("n", alias_name="n"),
        )
        .to_pandas()
    )
    out["sum_k"] = out["sum_k"].astype("int64")
    out["max_k"] = out["max_k"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(out.sort_values("event_type"), preserve_index=False)


def temperature_sample_documents(sf_dir: str) -> ray.data.Dataset:
    """Temperature-balanced language sampling (the multilingual data-mixing
    standard, T=2): per-language keep-rate ``sqrt(N_min / N_lang)`` — the
    rarest language is kept in full, common languages are downsampled by
    the square-root of their over-representation, flattening the language
    distribution toward ``p^(1/2)``.

    Scale story: pass 1 is a map-side per-batch language count reduced to a
    handful of driver rows (never a corpus-sized aggregate); pass 2 is a
    shuffle-free md5-threshold filter — any worker decides membership
    locally.  Rates use only IEEE-correctly-rounded ops (divide, sqrt,
    multiply, floor), so DuckDB reproduces the thresholds bit-for-bit and
    the membership exactly.
    """
    import numpy as np

    from ..functions.dedup import md5_u64

    ds = _read(sf_dir, "documents", ["doc_id", "lang"]).materialize()

    def partial_counts(batch: pa.Table) -> pa.Table:
        langs, counts = np.unique(
            np.asarray(batch.column("lang").to_pylist(), dtype=object),
            return_counts=True,
        )
        return pa.table(
            {
                "lang": pa.array(list(langs), type=pa.string()),
                "n": pa.array(counts, type=pa.int64()),
            }
        )

    parts = ds.map_batches(
        partial_counts, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # ~(#blocks x #languages) rows: tiny at any corpus size
    totals = parts.groupby("lang")["n"].sum()
    n_min = np.float64(int(totals.min()))
    # threshold grid 1e12: md5 % 1e12 < floor(1e12 * sqrt(n_min/n_lang))
    thr = {
        lang: int(np.floor(np.float64(1e12) * np.sqrt(n_min / np.float64(int(n)))))
        for lang, n in totals.items()
    }
    mod = 10**12

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        langs = batch.column("lang").to_pylist()
        keep = [
            md5_u64(str(d).encode()) % mod < thr[lg]
            for d, lg in zip(ids, langs)
        ]
        return batch.filter(pa.array(keep))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


def quality_buckets(
    sf_dir: str, n_buckets: int = 4, n_ranges: int = 64
) -> ray.data.Dataset:
    """NTILE(n)-style quality quantile buckets over the sketched-LM score
    (``functions/sketch.lm_quality``): bucket 1 = worst quartile, bucket n
    = best — the CCNet-style perplexity-bucket partition of a corpus.

    Exact global ranks WITHOUT a global sort: score space is cut into
    ``n_ranges`` value intervals (monotone in score, so global order =
    (interval, score, doc_id) order); pass 1 counts rows per interval (a
    tiny table → driver exclusive offsets), pass 2 co-locates each
    interval, sorts it locally by (score, doc_id) and adds its offset —
    the pack_sequences prefix-sum discipline applied to ranking.
    """
    import numpy as np
    import pandas as pd

    from ..functions.groups import coarse_grouped, int_pid
    from ..functions.sketch import lm_quality

    scores = lm_quality(
        _read(sf_dir, "documents", ["doc_id", "text"])
    ).materialize()
    total = scores.count()
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "avg_logp": pa.array([], type=pa.float64()),
            "bucket": pa.array([], type=pa.int32()),
        }
    )
    if total == 0:
        return ray.data.from_arrow(empty)
    lo = float(scores.min("avg_logp"))
    hi = float(scores.max("avg_logp"))
    width = (hi - lo) / n_ranges if hi > lo else 1.0

    def add_range(batch: pa.Table) -> pa.Table:
        s = batch.column("avg_logp").to_numpy()
        rid = np.clip(((s - lo) / width).astype(np.int64), 0, n_ranges - 1)
        return batch.append_column("range_id", pa.array(rid, type=pa.int64()))

    ranged = scores.map_batches(
        add_range, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def range_counts(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("range_id", as_index=False).agg(n=("doc_id", "count"))

    counts = coarse_grouped(
        ranged.select_columns(["doc_id", "range_id"]),
        lambda b: int_pid(b, ["range_id"], 64),
        range_counts,
    ).to_pandas()
    counts = counts.sort_values("range_id")
    offsets = dict(
        zip(
            counts["range_id"].tolist(),
            np.concatenate(
                ([0], np.cumsum(counts["n"].to_numpy())[:-1])
            ).tolist(),
        )
    )

    size_lo = total // n_buckets
    rem = total % n_buckets
    boundary = rem * (size_lo + 1)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["range_id", "avg_logp", "doc_id"], kind="mergesort"
        )
        within = df.groupby("range_id").cumcount().to_numpy()
        rank = within + np.array(
            [offsets[r] for r in df["range_id"].tolist()], dtype=np.int64
        )
        # NTILE semantics: the first (total % n) buckets hold one extra row
        bucket = np.where(
            rank < boundary,
            rank // (size_lo + 1),
            rem + (rank - boundary) // max(size_lo, 1),
        ).astype(np.int32) + 1
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "avg_logp": df["avg_logp"].to_numpy(),
                "bucket": bucket,
            }
        )

    return coarse_grouped(
        ranged.select_columns(["doc_id", "avg_logp", "range_id"]),
        lambda b: int_pid(b, ["range_id"], 64),
        assign,
    )
