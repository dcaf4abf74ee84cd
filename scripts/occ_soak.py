"""Scaled-up random-interleaving soak for optimistic commit rebase.

The pytest version (tests/test_occ.py::test_occ_interleaving_soak) runs 3
writers x 6 steps; this driver runs W writers x S steps with a fresh seed
per run, each writer owning a disjoint id range and randomly interleaving
rebase-enabled appends, merges, and compactions. Invariant: the final
table state equals the per-writer serial expectation exactly — whatever
interleaving the scheduler produced — and at least one commit actually
rebased.

Usage: python scripts/occ_soak.py [seed] [writers] [steps]
Prints one JSON line per run with rebase/conflict/commit counts.
"""

import json
import random
import sys
import tempfile
import threading

from pyspark.sql import SparkSession
from pyspark.sql import types as T

sys.path.insert(0, ".")

from techtalk_data_pipeline_snowpark_spark.lake import (  # noqa: E402
    ConcurrentCommitError,
    LakeTable,
)
from techtalk_data_pipeline_snowpark_spark.lake.merge import merge_into  # noqa: E402

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
)
N_BUCKETS = 8


def _df(spark, ids, mult=2):
    return spark.createDataFrame([(int(i), int(i) * mult) for i in ids], SCHEMA)


def run(spark, root, seed, writers, steps):
    t = LakeTable.create(spark, root, SCHEMA, key_cols=["id"], num_buckets=N_BUCKETS)
    ranges = {w: range(w * 10_000, w * 10_000 + 60) for w in range(writers)}
    expected = {}
    lock = threading.Lock()
    errs = []
    merge_retries = [0]
    barrier = threading.Barrier(writers)

    def writer(wid):
        rng = random.Random(seed * 1_000_003 + wid)
        ids = list(ranges[wid])
        handle = LakeTable(spark, root)
        try:
            barrier.wait()
            for step in range(steps):
                op = rng.choice(["append", "merge", "merge", "compact"])
                if op == "append":
                    fresh = [i for i in ids if i not in expected][: rng.randint(3, 8)]
                    if not fresh:
                        op = "merge"
                    else:
                        handle.append(_df(spark, fresh), rebase=True)
                        with lock:
                            expected.update({i: i * 2 for i in fresh})
                if op == "merge":
                    pick = rng.sample(ids, rng.randint(2, 6))
                    mult = step + 3
                    for _ in range(40):
                        try:
                            merge_into(handle, _df(spark, pick, mult), on=["id"], rebase=True)
                            break
                        except ConcurrentCommitError:
                            merge_retries[0] += 1
                            continue
                    else:
                        raise RuntimeError("merge starved after 40 retries")
                    with lock:
                        expected.update({i: i * mult for i in pick})
                if op == "compact":
                    for _ in range(40):
                        try:
                            handle.compact(rebase=True)
                            break
                        except ConcurrentCommitError:
                            continue
        except Exception as e:  # noqa: BLE001 — surfaced via errs
            errs.append(f"writer {wid}: {type(e).__name__}: {e}")

    threads = [threading.Thread(target=writer, args=(w,)) for w in ranges]
    [th.start() for th in threads]
    [th.join() for th in threads]
    rows = dict(
        (r["id"], r["v"]) for r in t.read().collect()
    )
    entries = t.log_entries()
    rebased = sum(1 for e in entries if (e.get("summary") or {}).get("rebased_over"))
    ok = not errs and rows == expected
    return {
        "seed": seed,
        "writers": writers,
        "steps": steps,
        "ok": ok,
        "rows": len(rows),
        "commits": len(entries),
        "commits_rebased": rebased,
        "merge_conflict_reruns": merge_retries[0],
        "errors": errs[:3],
        "state_mismatch": None if rows == expected else {
            "missing": len(set(expected) - set(rows)),
            "extra": len(set(rows) - set(expected)),
            "wrong": sum(1 for k in set(rows) & set(expected) if rows[k] != expected[k]),
        },
    }


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    writers = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("occ-soak")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as d:
        out = run(spark, d + "/t", seed, writers, steps)
    print(json.dumps(out))
    sys.exit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
