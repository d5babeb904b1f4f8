#!/usr/bin/env python
"""Side-by-side Spark-vs-DuckDB check of every __spark_entry__ query —
mirrors the driver's correctness gate (row count + schema names + sorted
value compare).

Usage: python scripts/verify_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import pathlib
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name, spark_pdf, duck_pdf) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"schema: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rows: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            if str(a[c].dtype).startswith("float") or str(b[c].dtype).startswith("float"):
                av = a[c].astype(float).to_numpy()
                bv = b[c].astype(float).to_numpy()
                ok = np.allclose(av, bv, atol=2e-6, equal_nan=True)
            else:
                ok = (a[c].astype(str).to_numpy() == b[c].astype(str).to_numpy()).all()
            if not ok:
                bad = (
                    a[c].astype(str).to_numpy() != b[c].astype(str).to_numpy()
                ).nonzero()[0][:3]
                problems.append(
                    f"col {c}: first diffs at {bad.tolist()}: "
                    f"spark={a[c].iloc[bad].tolist()} duck={b[c].iloc[bad].tolist()}"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from grappolo_spark.session import get_spark

    spark = get_spark("verify-queries", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    sqls = e.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in sqls:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{t_spark:.1f}s]")
            n_rowsonly += 1
            continue
        t0 = time.time()
        try:
            ddf = con.execute(sqls[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        t_duck = time.time() - t0
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok    {name}: {len(sdf)} rows [spark {t_spark:.1f}s, duck {t_duck:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} FAIL")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
