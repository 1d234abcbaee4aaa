"""As-of join: co-partitioned sorted-merge semantics incl. tie rule."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from vexor_ray.pipelines.joins import asof_join_events_orders


def _ts(h):
    return dt.datetime(2026, 1, 1, h, 0, 0)


def test_asof_join_semantics(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "ts": pa.array([_ts(5), _ts(10), _ts(1), _ts(7)], type=pa.timestamp("us")),
                "user_id": pa.array([7, 7, 7, 8], type=pa.int64()),
                "event_type": ["a"] * 4,
                "value": [1.0] * 4,
                "props": [""] * 4,
            }
        ),
        tmp_path / "events.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([100, 101, 102, 200], type=pa.int64()),
                "o_custkey": pa.array([7, 7, 7, 9], type=pa.int64()),
                "o_orderstatus": ["F"] * 4,
                "o_totalprice": [10.0, 20.0, 30.0, 40.0],
                # orders 101 and 102 tie on date → highest orderkey wins
                "o_orderdate": pa.array(
                    [_ts(2), _ts(4), _ts(4), _ts(0)], type=pa.timestamp("us")
                ),
                "o_orderpriority": ["x"] * 4,
            }
        ),
        tmp_path / "orders.parquet",
    )
    out = (
        asof_join_events_orders(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # event 3 (t=1h) precedes every user-7 order → dropped (inner as-of);
    # event 4's user 8 has no orders → dropped
    assert out["event_id"].tolist() == [1, 2]
    # both events see the (date=4h, orderkey=102) winner — tie by max key
    assert out["o_orderkey"].tolist() == [102, 102]
    assert out["o_totalprice"].tolist() == [30.0, 30.0]
    assert out["user_id"].tolist() == [7, 7]


def test_range_join_window_edges(ray_session, tmp_path):
    import pandas as pd

    ts = pd.to_datetime(
        [
            "2024-01-01 10:00:00",  # e1 u1
            "2024-01-01 11:00:00",  # e2 u1: exactly 60 min after e1 -> match
            "2024-01-01 12:01:00",  # e3 u1: 61 min after e2 -> no match
            "2024-01-01 10:30:00",  # e4 u2: other user, never pairs with u1
        ]
    )
    pd.DataFrame(
        {"event_id": [1, 2, 3, 4], "ts": ts, "user_id": [1, 1, 1, 2],
         "event_type": ["x"] * 4, "value": [0.0] * 4, "props": [""] * 4}
    ).to_parquet(tmp_path / "events.parquet")
    from vexor_ray.pipelines.joins import range_join_events

    out = range_join_events(str(tmp_path), window_minutes=60).to_pandas()
    got = {tuple(r) for r in out[["event_id", "prior_event_id"]].values.tolist()}
    assert got == {(2, 1)}  # inclusive lower edge, exclusive beyond, no self


def test_user_moving_avg_window_reset(ray_session, tmp_path):
    import pandas as pd

    ts = pd.to_datetime(
        ["2024-01-01 10:00", "2024-01-01 10:01", "2024-01-01 10:02",
         "2024-01-01 10:03", "2024-01-01 10:00"]
    )
    pd.DataFrame(
        {"event_id": [1, 2, 3, 4, 5], "ts": ts,
         "user_id": [1, 1, 1, 1, 2], "event_type": ["x"] * 5,
         "value": [3.0, 6.0, 9.0, 12.0, 100.0], "props": [""] * 5}
    ).to_parquet(tmp_path / "events.parquet")
    from vexor_ray.pipelines.relational import user_moving_avg

    out = user_moving_avg(str(tmp_path), window=3).to_pandas()
    got = dict(zip(out["event_id"], out["mov_avg"]))
    assert got == {1: 3.0, 2: 4.5, 3: 6.0, 4: 9.0, 5: 100.0}
