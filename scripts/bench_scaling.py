"""Scaling-efficiency evidence (BASELINE.json north_rule: ≥0.8 from N to 4N
executors; sandbox protocol = local[8] vs local[32] on the SAME input).

Generates one deterministic CDC log, then runs the identical packaged
replay job via ``spark-submit --py-files dist/engine.zip`` at both
parallelism levels in fresh JVMs. Writes BENCH.md with throughput at both
levels and the scaling efficiency (throughput_4N / throughput_N) / 4.

Usage: python scripts/bench_scaling.py [n_events] [epochs]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_submit(cores: int, events: str, table: str, epochs: int, zip_path: str) -> dict:
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    cmd = [
        spark_submit,
        "--master", f"local[{cores}]",
        "--conf", f"spark.sql.shuffle.partitions={cores}",
        "--conf", "spark.driver.memory=24g",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        os.path.join(ROOT, "spark_submit_main.py"),
        "--events", events,
        "--table", table,
        "--epochs", str(epochs),
        "--salted",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT)
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not line:
        sys.stderr.write(out.stdout[-4000:] + "\n" + out.stderr[-4000:])
        raise RuntimeError(f"no JSON from spark-submit local[{cores}]")
    return json.loads(line[-1])


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    zip_path = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "package.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()

    work = tempfile.mkdtemp(prefix="scaling_")
    events = os.path.join(work, "events")

    # generate once (32 cores; generation is excluded from the timed runs)
    gen_table = os.path.join(work, "gen_discard")
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "spark_submit_main.py"),
         "--events", events, "--gen-events", str(n_events),
         "--table", gen_table, "--epochs", "1", "--max-lsn", "0"],
        capture_output=True, text=True, cwd=ROOT, check=True,
    )

    results = {}
    for cores in (8, 32):
        table = os.path.join(work, f"state_{cores}")
        t0 = time.time()
        m = run_submit(cores, events, table, epochs, zip_path)
        m["wall_sec"] = round(time.time() - t0, 1)
        m["throughput_lsns_per_sec"] = m["lsns_per_sec"]
        results[cores] = m
        print(f"local[{cores}]: {m['replay_sec']}s replay, "
              f"{m['lsns_per_sec']} events/sec, final_rows={m['final_rows']}")

    same_state = results[8]["final_rows"] == results[32]["final_rows"]
    eff = (results[32]["lsns_per_sec"] / results[8]["lsns_per_sec"]) / 4.0

    md = f"""# BENCH — CDC replay scaling evidence

North-rule criterion: ≥0.8 throughput scaling efficiency between N and 4N
executors. Sandbox protocol (BASELINE.md): same job, same input, fresh JVMs,
`spark-submit --py-files dist/engine.zip` at local[8] vs local[32].

Workload: {n_events:,} synthetic change events (zipf_s=1.2 hot-repo skew,
200 repos × 5000 paths, 60/30/10 insert/update/delete), {epochs} epochs,
salted two-phase max-LSN dedup, bucket-pruned MERGE into a 64-bucket lake
table. Generation excluded from the timed section.

| parallelism | replay sec | events/sec | final rows |
|---|---|---|---|
| local[8]  (N)  | {results[8]['replay_sec']} | {results[8]['lsns_per_sec']:,} | {results[8]['final_rows']:,} |
| local[32] (4N) | {results[32]['replay_sec']} | {results[32]['lsns_per_sec']:,} | {results[32]['final_rows']:,} |

**Scaling efficiency (throughput_4N / throughput_N) / 4 = {eff:.3f}**
(target ≥ 0.8). Final table state identical at both levels: {same_state}.

Reproduce: `python scripts/bench_scaling.py {n_events} {epochs}`
"""
    with open(os.path.join(ROOT, "BENCH.md"), "w") as f:
        f.write(md)
    print(f"\nscaling efficiency: {eff:.3f} (same final state: {same_state})")
    print("wrote BENCH.md")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
