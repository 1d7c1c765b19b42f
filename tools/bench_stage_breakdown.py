"""Per-stage scaling breakdown of the dedup pipeline: run the full
pipeline once at a given parallelism in memory-durability mode (no
parquet checkpoints) and print each stage's wall from the checkpoint
manager's metrics, plus the CC / non-stage remainder. Running this at
two levels and diffing per-stage walls localizes exactly which stage
holds end-to-end scaling below the CPU-bound stages' 0.8+.

Usage: python tools/bench_stage_breakdown.py [cpus] [replicate]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_replicated_documents  # noqa: E402
from imageduplicatefinder_spark.config import DedupConfig  # noqa: E402
from imageduplicatefinder_spark.plans.pipeline import DedupPipeline  # noqa: E402
from imageduplicatefinder_spark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mode = os.environ.get("SPARK_GRAFT_CKPT_MODE", "memory")
    shuffle_parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", str(cpus)))
    spark = get_spark(app_name="stage_breakdown",
                      master=f"local[{cpus}]",
                      shuffle_partitions=shuffle_parts)
    docs = build_replicated_documents(spark, sf_dir, replicate,
                                      distinct=True).cache()
    n = docs.count()
    # warm-up off the clock
    warm = docs.limit(1000).cache()
    warm.count()
    DedupPipeline(spark, DedupConfig(), checkpoint_dir=tempfile.mkdtemp(),
                  durability=mode).run(warm).plan.count()
    warm.unpersist()

    t0 = time.monotonic()
    pipe = DedupPipeline(spark, DedupConfig(),
                         checkpoint_dir=tempfile.mkdtemp(prefix="bd_"),
                         durability=mode)
    res = pipe.run(docs)
    res.plan.count()
    wall = time.monotonic() - t0
    stages = {m.stage: round(m.wall_s, 2) for m in pipe.ckpt.metrics}
    accounted = sum(stages.values())
    print(json.dumps({
        "cpus": cpus,
        "replicate": replicate,
        "docs": n,
        "ckpt_mode": mode,
        "total_wall_s": round(wall, 2),
        "stages": stages,
        "stage_sum_s": round(accounted, 2),
        "unaccounted_s": round(wall - accounted, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
