"""Scaling-efficiency evidence for the north_rule two-cluster-size
criterion: run bench.py on the SAME input at two parallelism levels
(local[8] and local[32] — the sandbox stand-in for N and 4N executors,
per driver instruction) in separate JVMs, and report throughput at both
plus efficiency = (T_8 / T_32) / 4 on the CPU-bound pipeline workload.

Usage: python tools/bench_scaling.py [sf_dir] [> BENCH_SCALING.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    out = subprocess.run(
        [sys.executable, "bench.py"], env=env, capture_output=True, text=True,
        check=True, timeout=3000,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    r8 = run(8, sf_dir)
    r32 = run(32, sf_dir)
    key = next(k for k in r8["queries"] if k.startswith("dedup_pipeline"))
    t8, t32 = r8["queries"][key], r32["queries"][key]
    speedup = t8 / t32
    eff = speedup / 4
    result = {
        "workload": key,
        "sf_dir": sf_dir,
        "pipeline_docs": r8["pipeline_docs"],
        "local8": {"wall_s": t8, "rows_per_sec": round(r8["pipeline_docs"] / t8, 1),
                   "total_s": r8["value"]},
        "local32": {"wall_s": t32, "rows_per_sec": round(r32["pipeline_docs"] / t32, 1),
                    "total_s": r32["value"]},
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "meets_0_8_target": eff >= 0.8,
    }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
