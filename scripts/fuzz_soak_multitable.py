"""Fuzz soak for the multi-table fan-out: run the randomized differential
scenario from tests/test_fuzz_multitable.py over many fresh seeds.

Usage: python scripts/fuzz_soak_multitable.py START COUNT
Prints one line per seed (ok/FAIL) and a summary; exit 1 on any failure.
"""

import pathlib
import shutil
import sys
import tempfile

sys.path.insert(0, "tests")
sys.path.insert(0, ".")

from techtalk_data_pipeline_snowpark_spark.session import get_spark  # noqa: E402

import test_fuzz_multitable as sc  # noqa: E402


def main() -> int:
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    count = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("fuzz-soak-mt", cores=8, extra_conf={"spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for seed in range(start, start + count):
        root = tempfile.mkdtemp(prefix=f"fuzz_mt_{seed}_")
        try:
            sc.test_fuzz_multitable_crash_resume(spark, pathlib.Path(root), seed)
            print(f"seed {seed}: ok", flush=True)
        except Exception as e:  # noqa: BLE001 — soak must report, not die
            failures.append(seed)
            print(f"seed {seed}: FAIL {type(e).__name__}: {e}", flush=True)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    print(f"soak done: {count - len(failures)}/{count} ok, failures={failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
