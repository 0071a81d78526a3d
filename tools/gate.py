"""The ship gate: everything that must be green before a snapshot.

Runs (nonzero exit on any failure):
  1. python tools/counts.py --check      (README count drift — seconds;
                                          fail-fast: a drift stops here)
  2. python -m pytest tests/ -q          (full suite, ~15 min)
  3. python tools/check_correctness.py   (all queries vs DuckDB, ~15 min)

Round 9 shipped with 3 red tests and a red counts gate because the
end-of-round snapshot was not gated on its own checks; this script IS
the ritual. Steps 2 and 3 run in PARALLEL and BOTH run to completion
even if one fails (the final report names every red gate, which beats
saving minutes on an already-failed ship). They contend only mildly —
do not run bench.py at the same time, it is wall-clock-sensitive.

Run: python tools/gate.py [--quick]
  --quick skips the two long gates and runs counts + the driver-style
  entry smoke only (for mid-round sanity, not for shipping).
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(name: str, cmd: list[str]) -> "subprocess.Popen":
    print(f"[gate] start: {name}: {' '.join(cmd)}", flush=True)
    return subprocess.Popen(cmd, cwd=ROOT)


def main() -> int:
    quick = "--quick" in sys.argv[1:]
    py = sys.executable
    # counts first: it is the cheapest and the most often forgotten
    rc = subprocess.call([py, "tools/counts.py", "--check"], cwd=ROOT)
    if rc != 0:
        print("[gate] FAIL: counts drift — fix README.md numbers",
              flush=True)
        return 1
    if quick:
        rc = subprocess.call(
            [py, "-c",
             "from pyspark.sql import SparkSession\n"
             "import __spark_entry__ as e\n"
             "s = (SparkSession.builder.master('local[4]')"
             ".config('spark.ui.enabled','false').getOrCreate())\n"
             "rows = e.entry(s).collect()\n"
             "q, o = e.queries(), e.oracle_sql()\n"
             "print(f'entry rows={len(rows)} queries={len(q)} "
             "oracles={len(o)}')\n"
             "assert rows and q and o"],
            cwd=ROOT)
        print(f"[gate] quick {'GREEN' if rc == 0 else 'FAIL'}",
              flush=True)
        return rc
    procs = {
        "pytest": _run("pytest", [py, "-m", "pytest", "tests/", "-q"]),
        "check_correctness": _run(
            "check_correctness", [py, "tools/check_correctness.py"]),
    }
    failed = [n for n, p in procs.items() if p.wait() != 0]
    if failed:
        print(f"[gate] FAIL: {', '.join(failed)}", flush=True)
        return 1
    print("[gate] GREEN: counts + pytest + check_correctness",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
