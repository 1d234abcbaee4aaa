"""Local stand-in for the driver's correctness gate.

Runs each ``__ray_entry__.queries()`` entry and its ``oracle_sql()`` twin over
the same sf directory, then compares row count, schema (column names), and
values with rows and columns sorted — the same discipline the driver's
value-hash uses.  Usage::

    python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _to_pandas(obj):
    import pandas as pd
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(obj, ray.data.Dataset):
            return obj.to_pandas()
    except ImportError:
        pass
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    if isinstance(obj, pd.DataFrame):
        return obj
    raise TypeError(f"unsupported result type {type(obj)}")


def _canon(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, sf_dir: str, qfn, sql: str | None) -> dict:
    import duckdb

    res = _to_pandas(qfn(sf_dir))
    out = {"rows": len(res)}
    if sql is None:
        out["status"] = "no_oracle"
        return out
    con = duckdb.connect()
    # large-SF twins (recursive CTEs, wide self-joins) need disk spill
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    con.execute("SET max_temp_directory_size='60GB'")
    # leave headroom for the Ray session sharing the box; DuckDB's default
    # limit otherwise collides with the object store at large SFs
    con.execute("SET memory_limit='30GB'")
    con.execute("SET threads=8")
    for t in TABLES:
        f = Path(sf_dir) / f"{t}.parquet"
        if f.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{f}')")
    ora = con.execute(sql).fetchdf()
    out["oracle_rows"] = len(ora)
    if len(res) != len(ora):
        out["status"] = "ROWS_MISMATCH"
        return out
    a, b = _canon(res), _canon(ora)
    if list(a.columns) != list(b.columns):
        out["status"] = f"SCHEMA_MISMATCH {list(a.columns)} vs {list(b.columns)}"
        return out
    neq = []
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
            bad = ~((av == bv) | (av.isna() & bv.isna()))
        else:
            try:
                bad = av.astype(str) != bv.astype(str)
            except Exception:
                bad = av != bv
        if bad.any():
            i = bad.idxmax()
            neq.append((c, int(bad.sum()), av[i], bv[i]))
    if neq:
        out["status"] = f"VALUES_MISMATCH {neq[:3]}"
    else:
        out["status"] = "OK"
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__ as e

    qs, oras = e.queries(), e.oracle_sql()
    failed = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            r = compare(name, sf_dir, fn, oras.get(name))
        except Exception as ex:
            r = {"status": f"ERROR {type(ex).__name__}: {ex}"}
        status = r.get("status")
        if status not in ("OK", "no_oracle"):
            failed += 1
        print(f"{name:24s} {status} rows={r.get('rows')}")
    ray.shutdown()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
