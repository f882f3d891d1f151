"""Local simulation of the driver's correctness gate:

runs every ``queries()`` entry at sf0.01 and compares row-count, schema
(column names) and order-insensitive values against ``oracle_sql()``
via DuckDB. Usage: python tools/check_entry.py [sf_dir] [query ...]
(optional query names restrict the run to those entries)
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(sf_dir: str = "/root/testdata/sf0.01", *only: str) -> int:
    import __spark_entry__ as e
    from fastfilter_spark.spark import get_spark

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    spark = get_spark("check_entry", cpus=8)

    qs, oracles = e.queries(), e.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"✗ {name}: spark error {str(ex)[:200]}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"~ {name}: rows-only, {len(got)} rows ({dt:.1f}s)")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as ex:
            failures.append((name, f"ORACLE ERROR: {ex}"))
            print(f"✗ {name}: oracle error {ex}")
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            failures.append((name, f"schema {list(g.columns)} vs {list(w.columns)}"))
            print(f"✗ {name}: schema mismatch {list(g.columns)} vs {list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append((name, f"rows {len(g)} vs {len(w)}"))
            print(f"✗ {name}: row count {len(g)} vs {len(w)}")
            continue
        eq = g.equals(w)
        if not eq:
            diff = (g != w).any(axis=1)
            failures.append((name, f"values differ in {diff.sum()} rows"))
            print(f"✗ {name}: {diff.sum()} differing rows\n  got:  {g[diff].head(3).to_dict('records')}\n  want: {w[diff].head(3).to_dict('records')}")
        else:
            print(f"✓ {name}: {len(g)} rows match ({dt:.1f}s)")
    spark.stop()
    print(f"\n{len(qs) - len(failures)}/{len(qs)} OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
