"""Driver-contract emulation: queries() vs oracle_sql() via DuckDB at sf0.001.

Mirrors the driver's check: run each Ray pipeline and its SQL oracle on the
same parquet tables, then compare row count + schema + order-insensitive
values (floats to 1e-6 after the pipelines' own rounding).
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def entry_mod():
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", Path(__file__).parent.parent / "__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        result = result.to_pandas()
    if isinstance(result, pa.Table):
        result = result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_unsigned_integer_dtype(df[c]) or pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame):
    a, b = _canon(ray_df), _canon(sql_df)
    assert list(a.columns) == list(b.columns), (name, list(a.columns), list(b.columns))
    assert len(a) == len(b), (name, len(a), len(b))
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            assert np.allclose(a[c], b[c], rtol=0, atol=2e-6, equal_nan=True), (name, c)
        else:
            assert a[c].tolist() == b[c].tolist(), (name, c)


def test_entry_smoke(ray_session, entry_mod):
    res = entry_mod.entry()
    df = _to_df(res)
    assert len(df) > 0
    assert set(df.columns) == {"query_id", "rank", "doc_id", "url", "preview", "score"}


def test_all_oracle_backed_queries(ray_session, entry_mod, duck):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    failures = []
    for name, sql in oracles.items():
        ray_df = _to_df(qs[name](SF_DIR))
        sql_df = duck.sql(sql).df()
        try:
            _compare(name, ray_df, sql_df)
        except AssertionError as e:
            failures.append((name, str(e)[:500]))
    assert not failures, failures


def test_rows_only_queries_run(ray_session, entry_mod):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name in set(qs) - set(oracles):
        df = _to_df(qs[name](SF_DIR))
        assert df is not None and len(df.columns) > 0, name
