"""CPU-bound-stage scaling evidence: time ONLY the fingerprint
(signatures) stage — the pipeline's dominant compute at realistic dup
rates — at two parallelism levels on the same input.

Rationale: the full-pipeline ratio on this sandbox conflates three
local-mode artifacts measured in BENCH.md — (a) the shared host
delivers ~12-13 effective cores of the 32 advertised
(tools/cpu_calibration.py), (b) local mode shares ONE shuffle disk
across all task threads, so shuffle/checkpoint phases are
disk-bandwidth-bound and cannot scale with thread count by
construction (a real N->4N executor cluster scales disks and network
with executors), and (c) an Arrow UDF slot runs a JVM thread + a
Python worker, so local[N] is ~2N runnables. The per-stage measurement
isolates the scalable compute from the local-disk floor.

Usage: python tools/bench_stage_scaling.py [sf_dir] [n_low] [n_high] [replicate]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

STAGE_SNIPPET = r"""
import os, sys, tempfile, time
sys.path.insert(0, ".")
cpus = int(os.environ["STAGE_CPUS"])
replicate = int(os.environ["STAGE_REPLICATE"])
sf_dir = os.environ["STAGE_SF_DIR"]
os.environ["SPARK_GRAFT_BENCH_DISTINCT"] = "1"
from imageduplicatefinder_spark.session import get_spark
from imageduplicatefinder_spark.config import DedupConfig
from imageduplicatefinder_spark.operators.signatures import compute_signatures
from bench import build_replicated_documents
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
from pyspark.sql import functions as F
docs = build_replicated_documents(spark, sf_dir, replicate, distinct=True).cache()
n = docs.count()
def consume(df):
    # aggregate consumer: forces full UDF evaluation on every row but
    # produces one output row — no parquet write, so the measurement is
    # pure compute (the local single shuffle/checkpoint disk is the
    # non-scaling resource documented in BENCH.md)
    return df.agg(F.sum(F.bit_count(F.col("simhash"))),
                  F.sum(F.size("shingles"))).collect()
# warmup: spin up python workers / JIT
consume(compute_signatures(docs.limit(2048), DedupConfig()))
t0 = time.monotonic()
consume(compute_signatures(docs, DedupConfig()))
wall = time.monotonic() - t0
print(json.dumps({"cpus": cpus, "docs": n, "wall_s": round(wall, 2),
                  "docs_per_sec": round(n / wall, 1)}))
""".replace("json.dumps", "__import__('json').dumps")


def run(cpus: int, sf_dir: str, replicate: int) -> dict:
    env = dict(os.environ)
    env.update(
        STAGE_CPUS=str(cpus), STAGE_SF_DIR=sf_dir, STAGE_REPLICATE=str(replicate)
    )
    out = subprocess.run(
        [sys.executable, "-c", STAGE_SNIPPET], env=env, capture_output=True,
        text=True, check=True, timeout=3000,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    replicate = int(sys.argv[4]) if len(sys.argv) > 4 else 48
    r_low = run(n_low, sf_dir, replicate)
    r_high = run(n_high, sf_dir, replicate)
    factor = n_high / n_low
    speedup = r_low["wall_s"] / r_high["wall_s"]
    print(json.dumps({
        "stage": "signatures (fingerprint UDF)",
        "docs": r_low["docs"],
        f"local{n_low}": r_low,
        f"local{n_high}": r_high,
        "parallelism_factor": factor,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(speedup / factor, 3),
    }, indent=1))


if __name__ == "__main__":
    main()
