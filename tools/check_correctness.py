"""Local emulation of the driver's correctness gate: run every
__spark_entry__.queries() entry at a given sf dir and diff against
oracle_sql() via DuckDB (row count + order-insensitive values).

Usage: python tools/check_correctness.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from pkd_tree_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]
    spark = get_spark(cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, os_ = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        t1 = time.time()
        sql = os_.get(name)
        if sql is None:
            print(f"SKIP  {name}: rows={len(got)} ({t1-t0:.1f}s, no oracle)")
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} vs {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL  {name}: rows {len(g)} vs {len(w)}")
            failures += 1
            continue
        eq = g.reset_index(drop=True).astype(str).equals(w.reset_index(drop=True).astype(str))
        if not eq:
            diff = (g.astype(str) != w.astype(str)).any(axis=1)
            print(f"FAIL  {name}: {int(diff.sum())}/{len(g)} mismatched rows")
            print("  got :", g[diff].head(3).to_dict("records"))
            print("  want:", w[diff].head(3).to_dict("records"))
            failures += 1
            continue
        dtypes_note = "" if list(g.dtypes.astype(str)) == list(w.dtypes.astype(str)) else (
            f"  [dtype diff: {dict(zip(g.columns, zip(g.dtypes.astype(str), w.dtypes.astype(str))))}]"
        )
        print(f"OK    {name}: rows={len(g)} ({t1-t0:.1f}s spark){dtypes_note}")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
