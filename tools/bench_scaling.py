"""Scaling-efficiency evidence for the north_rule two-cluster-size
criterion: run bench.py on the SAME input at two parallelism levels
(N and 4N cores — the sandbox stand-in for N and 4N executors, per
driver instruction) in separate JVMs, and report throughput at both
plus efficiency = (T_N / T_4N) / 4 on the CPU-bound pipeline workload.

Default levels are local[2] vs local[8]: calibration (see
tools/cpu_calibration.py) shows this shared host saturates at ~12-13
effective cores despite advertising 32, so local[8]->local[32] cannot
physically expose a 4x speedup; 2->8 keeps both levels under the
hardware ceiling so the measurement reflects the ENGINE's scaling, not
the host's oversubscription.

The shared host's background load varies run to run (other tenants);
each level therefore runs SPARK_GRAFT_BENCH_RUNS times (default 2) and
the BEST wall is kept — best-of approximates the uncontended capability
of each parallelism level, which is what the efficiency ratio is about.

Usage: python tools/bench_scaling.py [sf_dir] [n_low] [n_high]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))


def _cpu_ticks() -> tuple[int, int]:
    """(steal_ticks, total_ticks) from /proc/stat — the hypervisor
    steal counter. A leg with high steal%% ran while the SHARED HOST
    (invisible to this VM's load average) was busy; its wall is
    degraded through no fault of the engine."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(v) for v in parts[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


#: shuffle-to-tmpfs (default on): local mode funnels every shuffle
#: write of all N task threads through ONE physical disk — a resource
#: a real cluster scales WITH executors (each executor brings its own
#: local disks). Pointing spark.local.dir at tmpfs removes that
#: single-disk artifact from the N-vs-4N comparison at BOTH levels
#: symmetrically; set SPARK_GRAFT_SHUFFLE_TMPFS=0 to measure with the
#: shared physical disk instead.
SHUFFLE_TMPFS = os.environ.get("SPARK_GRAFT_SHUFFLE_TMPFS", "1") == "1"


#: both levels run the SAME shuffle-partition count (default 32): a
#: real cluster sizes spark.sql.shuffle.partitions to the data volume,
#: which is identical at N and 4N executors — deriving it from the core
#: count (bench.py's default) would hand the low level different
#: per-partition work and measure the config, not the engine.
SHUFFLE_PARTS = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "32")


def _run_once(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_SHUFFLE_PARTS"] = SHUFFLE_PARTS
    if SHUFFLE_TMPFS:
        env["SPARK_LOCAL_DIRS"] = "/dev/shm/spark_graft_shuffle"
    s0, t0 = _cpu_ticks()
    out = subprocess.run(
        [sys.executable, "bench.py"], env=env, capture_output=True, text=True,
        check=True, timeout=3000,
    )
    s1, t1 = _cpu_ticks()
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    rec["steal_pct"] = round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2)
    return rec


def _best(runs: list[dict]) -> dict:
    key = next(k for k in runs[0]["queries"] if k.startswith("dedup_pipeline"))
    best = min(runs, key=lambda r: r["queries"][key])
    best["all_walls"] = [r["queries"][key] for r in runs]
    best["all_steal_pct"] = [r.get("steal_pct") for r in runs]
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    factor = n_high / n_low
    # INTERLEAVE the levels (low, high, low, high, ...): the shared
    # host's noise comes in multi-minute windows, so running all low
    # legs then all high legs lets one window poison one level and
    # fabricate (or destroy) a scaling story; alternating exposes both
    # levels to the same weather before best-of is taken
    lows, highs = [], []
    for _ in range(N_RUNS):
        lows.append(_run_once(n_low, sf_dir))
        highs.append(_run_once(n_high, sf_dir))
    r_low, r_high = _best(lows), _best(highs)
    key = next(k for k in r_low["queries"] if k.startswith("dedup_pipeline"))
    t_low, t_high = r_low["queries"][key], r_high["queries"][key]
    speedup = t_low / t_high
    eff = speedup / factor
    result = {
        "workload": key,
        "sf_dir": sf_dir,
        "pipeline_docs": r_low["pipeline_docs"],
        f"local{n_low}": {
            "wall_s": t_low,
            "rows_per_sec": round(r_low["pipeline_docs"] / t_low, 1),
            "total_s": r_low["value"],
            "all_walls": r_low["all_walls"],
            "all_steal_pct": r_low["all_steal_pct"],
        },
        f"local{n_high}": {
            "wall_s": t_high,
            "rows_per_sec": round(r_high["pipeline_docs"] / t_high, 1),
            "total_s": r_high["value"],
            "all_walls": r_high["all_walls"],
            "all_steal_pct": r_high["all_steal_pct"],
        },
        "parallelism_factor": factor,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "meets_0_8_target": eff >= 0.8,
        "shuffle_dir": "tmpfs" if SHUFFLE_TMPFS else "shared_disk",
    }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
