"""Exploratory scaling matrix runner: replay the same event log at
(n_executors, cores_each) points with optional conf overrides, print one
JSON line per run. Used to find the honest N→4N configuration; BENCH.md
and bench_scaling.py are curated from these numbers.

Usage: python scripts/scaling_probe.py EVENTS_PATH EPOCHS "1x2,4x2" [k=v ...]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHM_LOCAL = "/dev/shm/spark-local"


def run_replay(n_exec: int, cores: int, events: str, epochs: int, extra: dict) -> dict:
    shutil.rmtree(SHM_LOCAL, ignore_errors=True)
    shutil.rmtree("/dev/shm/lake-probe", ignore_errors=True)
    os.makedirs(SHM_LOCAL, exist_ok=True)
    mem_mb = 14336 if n_exec <= 2 else 12288
    conf = {
        "spark.sql.shuffle.partitions": str(max(n_exec * cores * 4, 16)),
        "spark.driver.memory": "8g",
        "spark.executor.memory": f"{mem_mb}m",
        "spark.sql.adaptive.enabled": "true",
        "spark.ui.enabled": "false",
        "spark.local.dir": SHM_LOCAL,
    }
    conf.update(extra)
    cmd = [
        shutil.which("spark-submit")
        or os.path.join(os.path.dirname(sys.executable), "spark-submit"),
        "--master", f"local-cluster[{n_exec},{cores},{mem_mb}]",
    ]
    for k, v in conf.items():
        cmd += ["--conf", f"{k}={v}"]
    cmd += [
        "--py-files", os.path.join(ROOT, "dist", "engine.zip"),
        os.path.join(ROOT, "spark_submit_main.py"),
        "--events", events, "--table", f"/dev/shm/lake-probe/t{n_exec}x{cores}",
        "--epochs", str(epochs), "--broadcast-limit", os.environ.get("PROBE_BCAST", "0"),
    ]
    t0 = time.time()
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT)
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-2000:])
        raise RuntimeError(f"no JSON from {n_exec}x{cores}")
    m = json.loads(lines[-1])
    m["wall_sec"] = round(time.time() - t0, 1)
    m["config"] = f"{n_exec}x{cores}"
    return m


def main():
    events, epochs, points = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    extra = dict(kv.split("=", 1) for kv in sys.argv[4:])
    results = {}
    for pt in points.split(","):
        n, c = (int(x) for x in pt.split("x"))
        m = run_replay(n, c, events, epochs, extra)
        results[pt] = m
        print(json.dumps({
            "point": pt, "replay_sec": m["replay_sec"],
            "ev_per_sec": m["lsns_per_sec"], "rows": m["final_rows"],
            "wall_sec": m["wall_sec"],
        }), flush=True)
    shutil.rmtree(SHM_LOCAL, ignore_errors=True)
    shutil.rmtree("/dev/shm/lake-probe", ignore_errors=True)
    pts = list(results)
    if len(pts) == 2:
        a, b = results[pts[0]], results[pts[1]]
        factor = (int(pts[1].split("x")[0]) * int(pts[1].split("x")[1])) / (
            int(pts[0].split("x")[0]) * int(pts[0].split("x")[1])
        )
        print(json.dumps({
            "efficiency": round((b["lsns_per_sec"] / a["lsns_per_sec"]) / factor, 3),
            "same_final_state": a["final_rows"] == b["final_rows"],
        }), flush=True)


if __name__ == "__main__":
    main()
