"""Measure this host's EFFECTIVE core count with a pure-numpy workload
(the same kind of kernel the fingerprint UDF runs). The sandbox
advertises 32 CPUs (nproc, cpuset 0-31, no cgroup quota) but is a
shared host; this probe shows where added processes stop adding
throughput — which bounds what any local[N] scaling experiment can
show. Used to justify the N/4N levels picked in bench_scaling.py.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np


def work(_) -> int:
    x = np.arange(3_000_000, dtype=np.uint64)
    for _ in range(20):
        x = x * np.uint64(0x9E3779B97F4A7C15)
        x ^= x >> np.uint64(31)
    return int(x[0])


def main() -> None:
    results = {}
    base = None
    for n in (1, 2, 4, 8, 12, 16, 24, 32):
        best = min(
            _timed(n) for _ in range(3)
        )  # best-of-3 to damp shared-host noise
        if base is None:
            base = best
        results[n] = {
            "wall_s": round(best, 3),
            "effective_parallelism": round(n * base / best, 1),
        }
    print(json.dumps(results, indent=1))


def _timed(n: int) -> float:
    t0 = time.time()
    with mp.Pool(n) as p:
        p.map(work, range(n))
    return time.time() - t0


if __name__ == "__main__":
    main()
