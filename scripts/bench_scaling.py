"""Scaling-efficiency evidence runner (see BENCH.md for the analysis).

Runs, in fresh JVMs via `spark-submit --py-files dist/engine.zip`:
1. end-to-end CDC replay at N=1 vs 4N=4 single-core executors over the
   same generated event log — the honest north-rule pair: the largest
   executor shape whose 4N aggregate (4 slots) stays inside this host's
   measured ~8-effective-core memory-bandwidth envelope for string-heavy
   stages (r2 measured: 1×1→4×1 efficiency 0.87; widening to 2-core
   executors puts 4N at 8 slots where the documented host artifact caps
   throughput at ~150k ev/s regardless of further cores);
2. the same pair at 2-core executors (1×2 vs 4×2), reported as the
   cap-evidence point (4×1 ≈ 4×2 throughput ⇒ slots 5-8 add nothing);
3. the compute-bound distribution probe (64 × 2 s tasks, warmed workers)
   at local[8] vs local[32].

Prints a JSON summary; BENCH.md is curated by hand from these numbers.

Usage: python scripts/bench_scaling.py [n_events] [epochs]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHM_LOCAL = "/dev/shm/spark-local"


def clean_shm():
    shutil.rmtree(SHM_LOCAL, ignore_errors=True)
    shutil.rmtree("/dev/shm/lake-scaling", ignore_errors=True)
    os.makedirs(SHM_LOCAL, exist_ok=True)


def spark_submit_bin() -> str:
    return shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )


def extra_confs() -> list[str]:
    """Optional per-run Spark conf overrides from SCALING_EXTRA_CONFS
    (semicolon-separated k=v). Used for conf A/B experiments (e.g. shuffle
    codec) without editing the protocol script between legs."""
    raw = os.environ.get("SCALING_EXTRA_CONFS", "").strip()
    out: list[str] = []
    for kv in filter(None, (s.strip() for s in raw.split(";"))):
        out += ["--conf", kv]
    return out


def run_replay(
    n_exec: int, events: str, table: str, epochs: int, zip_path: str, cores: int = 1
) -> dict:
    cmd = [
        spark_submit_bin(),
        "--master", f"local-cluster[{n_exec},{cores},12288]",
        "--conf", f"spark.sql.shuffle.partitions={max(n_exec * cores * 4, 16)}",
        "--conf", "spark.driver.memory=8g",
        "--conf", "spark.executor.memory=12g",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.ui.enabled=false",
        "--conf", f"spark.local.dir={SHM_LOCAL}",
        *extra_confs(),
        "--py-files", zip_path,
        os.path.join(ROOT, "spark_submit_main.py"),
        "--events", events, "--table", table,
        "--epochs", str(epochs), "--broadcast-limit", "0",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT)
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not line:
        sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-3000:])
        raise RuntimeError(f"no JSON from {n_exec}-executor replay")
    return json.loads(line[-1])


def run_compute_probe() -> dict:
    code = (
        "import sys, time\n"
        "from pyspark.sql import SparkSession\n"
        "cores = sys.argv[1]\n"
        "spark = (SparkSession.builder.master(f'local[{cores}]')"
        ".config('spark.ui.enabled','false').getOrCreate())\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "def busy(i):\n"
        "    t0=time.time(); x=0\n"
        "    while time.time()-t0 < 2: x+=1\n"
        "    return x\n"
        "spark.sparkContext.parallelize(range(64), 64).map(busy).count()\n"
        "t0=time.time()\n"
        "spark.sparkContext.parallelize(range(64), 64).map(busy).count()\n"
        "print('RESULT', round(time.time()-t0,2))\n"
    )
    path = os.path.join(tempfile.mkdtemp(), "probe.py")
    with open(path, "w") as f:
        f.write(code)
    times = {}
    for c in ("8", "32"):
        r = subprocess.run(
            [spark_submit_bin(), "--master", f"local[{c}]",
             "--conf", "spark.ui.enabled=false", path, c],
            capture_output=True, text=True,
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")]
        times[c] = float(line[-1].split()[1]) if line else None
    eff = (times["8"] / times["32"]) / 4 if times["8"] and times["32"] else None
    return {"local8_sec": times["8"], "local32_sec": times["32"],
            "distribution_efficiency": round(eff, 3) if eff else None}


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    # Optional third arg: explicit leg list "1x2,4x2,1x2,4x2" — lets a run
    # measure an alternative N→4N executor shape (e.g. 2-core executors)
    # without editing the script. Default remains the 1-core pairs + 4x2
    # envelope point.
    legs_arg = sys.argv[3] if len(sys.argv) > 3 else None

    zip_path = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "package.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()

    work = tempfile.mkdtemp(prefix="scaling_")
    events = os.path.join(work, "events")
    gen_env = dict(os.environ, PYSPARK_SUBMIT_ARGS="--driver-memory 24g pyspark-shell")
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "spark_submit_main.py"),
         "--events", events, "--gen-events", str(n_events),
         "--table", os.path.join(work, "gen_discard"), "--gen-only"],
        capture_output=True, text=True, cwd=ROOT, check=True, env=gen_env,
    )

    # ALTERNATED legs: this host's throughput drifts 1.5-3× on a scale of
    # minutes (BENCH.md), so an N leg and a 4N leg measured half an hour
    # apart can see different machines — the ratio is only meaningful
    # within adjacent legs. Run THREE N,4N pairs so the reported median is
    # a true middle element (two pairs made [len//2] the MAX — review
    # finding); the envelope point (4x2) last.
    legs = [(1, 1), (4, 1), (1, 1), (4, 1), (1, 1), (4, 1), (4, 2)]
    if legs_arg:
        legs = [tuple(int(x) for x in leg.split("x")) for leg in legs_arg.split(",")]
    runs = []
    results = {}
    for i, (n_exec, cores) in enumerate(legs):
        clean_shm()
        m = run_replay(
            n_exec, events, f"/dev/shm/lake-scaling/leg{i}-{n_exec}x{cores}",
            epochs, zip_path, cores=cores,
        )
        runs.append(((n_exec, cores), m))
        results[(n_exec, cores)] = m  # last run of each shape wins
        print(f"leg{i} {n_exec}x{cores}: {m['replay_sec']}s, "
              f"{m['lsns_per_sec']} ev/s, rows={m['final_rows']}")
    clean_shm()
    pair_effs = []
    for a in range(0, len(legs) - 1, 2):
        ev_n = runs[a][1]["lsns_per_sec"]
        ev_4n = runs[a + 1][1]["lsns_per_sec"]
        pair_effs.append(round((ev_4n / ev_n) / 4, 3))
    eff_sorted = sorted(pair_effs)
    eff_median = eff_sorted[len(eff_sorted) // 2]  # true middle of 3 pairs
    eff_mean = round(sum(pair_effs) / len(pair_effs), 3)
    print(f"adjacent-pair efficiencies: {pair_effs} "
          f"(median {eff_median}, mean {eff_mean}, min {eff_sorted[0]})")

    probe = run_compute_probe()
    print(f"compute probe: local[8]={probe['local8_sec']}s "
          f"local[32]={probe['local32_sec']}s "
          f"→ distribution efficiency {probe['distribution_efficiency']}")

    print(json.dumps({
        "n_events": n_events, "epochs": epochs,
        "replay": {f"{k[0]}x{k[1]}": {"sec": v["replay_sec"],
                                      "ev_per_sec": v["lsns_per_sec"],
                                      "rows": v["final_rows"]}
                   for k, v in results.items()},
        "pairwise_efficiency_n_to_4n": pair_effs,
        "end_to_end_efficiency_n_to_4n": eff_median,
        "efficiency_mean": eff_mean,
        "efficiency_min": eff_sorted[0],
        "beyond_envelope_4x2_ev_per_sec": (
            results[(4, 2)]["lsns_per_sec"] if (4, 2) in results else None
        ),
        "same_final_state": len(
            {m["final_rows"] for _, m in runs}
        ) == 1,
        "compute_probe": probe,
    }))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
