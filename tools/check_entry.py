"""Local simulation of the driver's correctness gate:

runs every ``queries()`` entry at sf0.01 and compares row-count, schema
(column names) and order-insensitive values against ``oracle_sql()``
via DuckDB. Usage:
    python tools/check_entry.py [--json OUT.json] [sf_dir] [query ...]
(optional query names restrict the run to those entries; --json writes
a driver-shaped per-query artifact — the committed CORRECTNESS_local_r*
files, covering ALL queries even when the driver samples a subset)
"""

from __future__ import annotations

import json
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


def main(sf_dir: str = "/root/testdata/sf0.01", *only: str,
         json_out: str = None) -> int:
    import __spark_entry__ as e
    from fastfilter_spark.spark import get_spark

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    spark = get_spark("check_entry", cpus=8)

    qs, oracles = e.queries(), e.oracle_sql()
    if only:
        unknown = [n for n in only if n not in qs]
        if unknown:
            # a typo'd name must fail loud — silently filtering to zero
            # queries would print "0/0 OK" and exit green having
            # verified nothing
            raise SystemExit(f"unknown query names: {unknown} "
                             f"(available: {sorted(qs)})")
        qs = {k: v for k, v in qs.items() if k in only}
    failures = []
    report = {}

    def record(name, *, rows=None, schema=None, values=None,
               spark_rows=None, oracle_rows=None, err=None):
        report[name] = {"rows_match": rows, "schema_match": schema,
                        "hash_match": values, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}

    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"✗ {name}: spark error {str(ex)[:200]}")
            record(name, rows=False, schema=False, values=False,
                   err=f"spark: {str(ex)[:300]}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"~ {name}: rows-only, {len(got)} rows ({dt:.1f}s)")
            record(name, rows=len(got) >= 0, spark_rows=len(got),
                   err=None)
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as ex:
            failures.append((name, f"ORACLE ERROR: {ex}"))
            print(f"✗ {name}: oracle error {ex}")
            record(name, rows=False, schema=False, values=False,
                   spark_rows=len(got), err=f"oracle: {str(ex)[:300]}")
            continue
        g, w = canon(got), canon(want)
        record(name, rows=len(g) == len(w),
               schema=list(g.columns) == list(w.columns),
               values=False, spark_rows=len(g), oracle_rows=len(w))
        if list(g.columns) != list(w.columns):
            failures.append((name, f"schema {list(g.columns)} vs {list(w.columns)}"))
            print(f"✗ {name}: schema mismatch {list(g.columns)} vs {list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append((name, f"rows {len(g)} vs {len(w)}"))
            print(f"✗ {name}: row count {len(g)} vs {len(w)}")
            continue
        eq = g.equals(w)
        report[name]["hash_match"] = bool(eq)
        if not eq:
            diff = (g != w).any(axis=1)
            failures.append((name, f"values differ in {diff.sum()} rows"))
            print(f"✗ {name}: {diff.sum()} differing rows\n  got:  {g[diff].head(3).to_dict('records')}\n  want: {w[diff].head(3).to_dict('records')}")
        else:
            print(f"✓ {name}: {len(g)} rows match ({dt:.1f}s)")
    spark.stop()
    print(f"\n{len(qs) - len(failures)}/{len(qs)} OK")
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(report, fh, indent=2)
        print(f"wrote {json_out} ({len(report)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    argv, out = [], None
    it = iter(sys.argv[1:])
    for a in it:                       # accept --json anywhere in argv
        if a == "--json":
            out = next(it, None)
            if out is None:
                raise SystemExit("--json requires an output path")
        elif a.startswith("--"):
            raise SystemExit(f"unknown flag {a!r}")
        else:
            argv.append(a)
    sys.exit(main(*argv, json_out=out))
