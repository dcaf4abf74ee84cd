"""Contention microbench for optimistic commit rebase.

Scenario: a hot ingest stream (appends) races a background compactor on
one table. Without rebase, every lost conditional put forces the loser to
REDO its work (re-stage every file); with rebase the loser re-commits
metadata-only. We measure the compactor's cost to land K compactions
under sustained ingest, in both modes, on the same initial table.

Usage: python scripts/bench_occ.py [rows] [appends] [compactions]
Prints one JSON line; record the numbers in BENCH.md.
"""

import json
import sys
import threading
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, ".")

from techtalk_data_pipeline_snowpark_spark.lake import (  # noqa: E402
    ConcurrentCommitError,
    LakeTable,
)

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
)


def _df(spark, lo, n):
    return spark.range(lo, lo + n).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )


def run_mode(spark, root, rows, n_appends, n_compacts, rebase):
    t = LakeTable.create(spark, root, SCHEMA, key_cols=["id"], num_buckets=16)
    t.append(_df(spark, 0, rows))
    for i in range(3):  # fragment: several files per bucket
        t.append(_df(spark, rows + i * 1000, 1000))

    ingest_done = threading.Event()
    appended = [0]

    def ingest():
        handle = LakeTable(spark, root)
        lo = rows + 10_000
        for i in range(n_appends):
            handle.append(_df(spark, lo + i * 5000, 5000), rebase=True)
            appended[0] += 1
        ingest_done.set()

    compact_stats = {"landed": 0, "rewrite_attempts": 0, "rebased": 0, "sec": 0.0}

    def compactor():
        handle = LakeTable(spark, root)
        t0 = time.time()
        while compact_stats["landed"] < n_compacts:
            try:
                compact_stats["rewrite_attempts"] += 1
                res = handle.compact(max_files_per_bucket=1, rebase=rebase)
                if res.summary.get("files_compacted", 0) == 0:
                    compact_stats["rewrite_attempts"] -= 1
                    if ingest_done.is_set():
                        break  # nothing left to compact, stream over
                    time.sleep(0.2)  # wait for ingest to fragment buckets
                    continue
                compact_stats["landed"] += 1
                compact_stats["rebased"] += 1 if res.summary.get("rebased_over") else 0
            except ConcurrentCommitError:
                continue  # lost the race — redo the whole rewrite
        compact_stats["sec"] = round(time.time() - t0, 3)

    ti = threading.Thread(target=ingest)
    tc = threading.Thread(target=compactor)
    t0 = time.time()
    ti.start()
    tc.start()
    ti.join()
    tc.join(timeout=600)
    wall = round(time.time() - t0, 3)
    final = t.read().count()
    return {
        "mode": "rebase" if rebase else "retry-from-scratch",
        "wall_sec": wall,
        "appends_landed": appended[0],
        "final_rows": final,
        **compact_stats,
    }


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_appends = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    n_compacts = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .appName("bench-occ")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    out = {}
    for rebase in (False, True):
        with tempfile.TemporaryDirectory() as d:
            out[str(rebase)] = run_mode(
                spark, d + "/t", rows, n_appends, n_compacts, rebase
            )
    print(json.dumps({"bench": "occ_contention", "rows": rows, "modes": out}))


if __name__ == "__main__":
    main()
