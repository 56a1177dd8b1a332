"""Local replica of the driver's correctness gate: run every
__spark_entry__ query on Spark AND its oracle on DuckDB at a given sf,
compare row count, column names, and an order-insensitive value hash.

Both sides go through the pandas boundary (Spark .toPandas(), DuckDB
.fetchdf()) exactly like the driver, so dtype divergences that only
appear there (e.g. DuckDB HUGEINT -> float64 while Spark stays int64)
fail HERE before the driver ever sees them.

Usage: python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from bcdc2bcdc_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon = sorted(
        "\x1f".join(_cell(r[i]) for i in order) for r in rows
    )
    return hashlib.sha256("\n".join(canon).encode()).hexdigest()


def _cell(v: object) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _pandas_rows(df: pd.DataFrame) -> list[tuple]:
    """Convert a pandas frame to plain-Python row tuples, preserving the
    dtype the pandas boundary chose (float64 stays float -> repr '3.0')."""
    out = []
    for row in df.itertuples(index=False, name=None):
        out.append(tuple(_plain(v) for v in row))
    return out


def _plain(v: object) -> object:
    if isinstance(v, (np.ndarray, list, tuple)):
        return [_plain(x) for x in v]
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("parity", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(queries)
    if unknown:
        print(f"FAIL  unknown query names: {sorted(unknown)}")
        return 1
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
            srows = _pandas_rows(spdf)
            scols = list(spdf.columns)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:24s} spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"weak  {name:24s} rows={len(srows)} (no oracle)")
            continue
        try:
            opdf = con.execute(oracles[name]).fetchdf()
            ocols = list(opdf.columns)
            orows = _pandas_rows(opdf)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:24s} duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if not problems and value_hash(srows, scols) != value_hash(orows, ocols):
            problems.append("value-hash mismatch")
        if problems:
            failures += 1
            print(f"FAIL  {name:24s} {'; '.join(problems)}")
        else:
            print(f"ok    {name:24s} rows={len(srows)}")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
