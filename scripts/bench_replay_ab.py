"""Interleaved, PROBE-NORMALIZED A/B of CDC replay throughput between two
git refs (default: HEAD vs the round-2-end engine).

Protocol (the drift-robust one BENCH.md's history demands):
  1. generate ONE event log (deterministic, shared by every leg);
  2. alternate legs A,B,A,B,... — each leg is a FRESH JVM running the
     same 2M-event replay, bracketed by the fixed string-hash host probe
     (before + after);
  3. per leg, report raw ev/s AND normalized ev/s = ev/s x probe_mean
     (a 2x slower host halves ev/s and doubles the probe, so the product
     cancels the host);
  4. per adjacent (A,B) pair, report the normalized ratio A/B; the
     median ratio across pairs is the verdict.

This is the settlement protocol for the r3 open question: the driver's
BENCH_r03 read -25% replay ev/s vs r2 while a same-engine builder run
read +44%, on a host with documented 1.5-3x drift — absolute numbers
from different hours are not comparable; ratios-to-probe are.

Usage: python scripts/bench_replay_ab.py [refB] [n_events] [pairs]
  refB default 4ca9a53 (round-2 end), n_events default 2_000_000, pairs 2.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r'''
import json, os, sys, time

code_dir, log_path, table_dir, n_events, epochs = (
    sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]), int(sys.argv[5])
)
sys.path.insert(0, code_dir)
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", "64m")
    .config("spark.ui.enabled", "false")
    .appName("replay-ab-leg")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

def probe_once():
    t0 = time.time()
    (
        spark.range(0, 50_000_000)
        .select(F.xxhash64(F.concat(F.lit("probe-"), F.col("id").cast("string"))).alias("h"))
        .agg(F.count(F.when(F.col("h") % 2 == 0, 1)))
        .collect()
    )
    return round(time.time() - t0, 3)

def probe():
    # a COLD first probe in a fresh JVM measures JIT warmup (observed 4-6x
    # slower than warm), not host state: discard one, then take the min of
    # two timed runs as the host sample
    probe_once()
    return min(probe_once(), probe_once())

from techtalk_data_pipeline_snowpark_spark.cdc import CdcEngine

log = spark.read.parquet(log_path)
eng = CdcEngine(spark, table_dir, key_cols=("repo", "path"), num_buckets=16)
p0 = probe()
t0 = time.time()
eng.replay(log, max_lsn=n_events, epoch_size=(n_events + epochs - 1) // epochs)
dt = time.time() - t0
p1 = probe()
rows = eng.read_state().count()
print("LEGRESULT " + json.dumps({
    "replay_sec": round(dt, 3),
    "ev_per_sec": round(n_events / dt, 1),
    "probe_before": p0, "probe_after": p1,
    "probe_mean": round((p0 + p1) / 2, 3),
    "ev_per_sec_normalized": round(n_events / dt * (p0 + p1) / 2, 1),
    "final_rows": rows,
}))
'''


def run_leg(code_dir: str, log_path: str, table_dir: str,
            n_events: int, epochs: int, runner_path: str) -> dict:
    shutil.rmtree(table_dir, ignore_errors=True)
    env = dict(os.environ,
               PYSPARK_SUBMIT_ARGS="--driver-memory 24g pyspark-shell")
    out = subprocess.run(
        [sys.executable, runner_path, code_dir, log_path, table_dir,
         str(n_events), str(epochs)],
        capture_output=True, text=True, env=env, cwd=tempfile.gettempdir(),
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("LEGRESULT")]
    if not lines:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:])
        raise RuntimeError("leg produced no result")
    return json.loads(lines[-1].split(" ", 1)[1])


def main():
    ref_b = sys.argv[1] if len(sys.argv) > 1 else "4ca9a53"
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    epochs = 4

    work = tempfile.mkdtemp(prefix="replay_ab_")
    wt_b = os.path.join(work, "wt_b")
    subprocess.run(["git", "worktree", "add", "--detach", wt_b, ref_b],
                   cwd=ROOT, check=True, capture_output=True)
    runner_path = os.path.join(work, "leg_runner.py")
    with open(runner_path, "w") as f:
        f.write(RUNNER)
    try:
        # one shared deterministic log (generated with HEAD's generator;
        # both legs READ the same parquet so generator drift is irrelevant)
        log_path = os.path.join(work, "events_log")
        gen = (
            "import sys; sys.path.insert(0, %r)\n"
            "from pyspark.sql import SparkSession\n"
            "spark = (SparkSession.builder.master('local[32]')"
            ".config('spark.ui.enabled','false').getOrCreate())\n"
            "spark.sparkContext.setLogLevel('ERROR')\n"
            "from techtalk_data_pipeline_snowpark_spark.fixtures.generators "
            "import change_events\n"
            "change_events(spark, %d, n_repos=200, paths_per_repo=5000, "
            "zipf_s=1.2, seed=42).write.mode('overwrite').parquet(%r)\n"
            % (ROOT, n_events, log_path)
        )
        env = dict(os.environ,
                   PYSPARK_SUBMIT_ARGS="--driver-memory 24g pyspark-shell")
        subprocess.run([sys.executable, "-c", gen], check=True, env=env,
                       capture_output=True, text=True)

        legs = []
        for i in range(pairs):
            # COUNTERBALANCED order (AB, BA, AB, ...): alternating the
            # within-pair order cancels position effects (first-leg page
            # cache, background load ramps) across pairs
            order = (("A", ROOT), ("B", wt_b)) if i % 2 == 0 else (
                ("B", wt_b), ("A", ROOT))
            for name, code in order:
                r = run_leg(code, log_path, os.path.join(work, f"tbl_{i}_{name}"),
                            n_events, epochs, runner_path)
                r["leg"] = f"{name}{i}"
                legs.append(r)
                print(f"leg {name}{i}: {r['ev_per_sec']} ev/s raw, "
                      f"probe {r['probe_mean']}s -> "
                      f"{r['ev_per_sec_normalized']} normalized, "
                      f"rows={r['final_rows']}")
        ratios = []
        for i in range(pairs):
            pair = {legs[2 * i]["leg"][0]: legs[2 * i],
                    legs[2 * i + 1]["leg"][0]: legs[2 * i + 1]}
            ratios.append(round(
                pair["A"]["ev_per_sec_normalized"]
                / pair["B"]["ev_per_sec_normalized"], 3))
        med = sorted(ratios)[len(ratios) // 2]
        same_state = len({r["final_rows"] for r in legs}) == 1
        print(json.dumps({
            "ref_a": "HEAD", "ref_b": ref_b, "n_events": n_events,
            "legs": legs, "pair_ratios_a_over_b_normalized": ratios,
            "median_ratio": med, "a_not_slower": med >= 1.0,
            "same_final_state": same_state,
        }))
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt_b],
                       cwd=ROOT, capture_output=True)
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
