"""Local stand-in for the driver's correctness gate: run every
__spark_entry__ query on Spark AND its DuckDB oracle at the given sf_dir,
compare row count + column names + order-insensitive values.

Usage: python scripts/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v!r}"
    return repr(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["|".join(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("check_entry")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(rows)} rows, {dt:.1f}s)")
            if len(rows) == 0:
                print(f"      WARNING: 0 rows from {name}")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [c for c in res.columns]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        if sorted(cols) != sorted(ocols):
            failures.append(name)
            print(f"FAIL  {name}: columns {sorted(cols)} vs oracle {sorted(ocols)}")
            continue
        if len(rows) != len(orows):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(rows)} vs oracle {len(orows)}")
            continue
        a, b = canon(rows, cols), canon(orows, ocols)
        if a != b:
            failures.append(name)
            ndiff = sum(1 for x, y in zip(a, b) if x != y)
            print(f"FAIL  {name}: values differ ({ndiff}/{len(a)} rows)")
            for x, y in list(zip(a, b))[:200]:
                if x != y:
                    print(f"      spark : {x[:200]}")
                    print(f"      oracle: {y[:200]}")
                    break
        else:
            print(f"OK    {name}: {len(rows)} rows match ({dt:.1f}s)")
    print("----")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all checks passed")


if __name__ == "__main__":
    main()
