"""Label-prop vs large/small-star CC as the PIPELINE default, at depth
(round-4 verdict Next #7).

The CC stage pays one Spark job per propagation round, so its wall is
round-count x per-round latency. Label propagation needs O(component
diameter) rounds; the star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) needs O(log^2 n) — on
deep graphs star should win, on the shallow family graphs the dedup
pipeline actually produces the two should tie. This tool measures the
real thing: the full DedupPipeline with ``cc_algorithm`` flipped, at
two replication scales, reporting total wall AND the components-stage
wall from the checkpoint metrics (so the comparison is not polluted by
candidate-gen noise).

Both algorithms are output-identical (property-tested equal in
tests/test_components.py), which is why ``cc_algorithm`` is excluded
from the config hash — flipping the default can never change results,
only the physical iteration schedule.

Usage: python tools/bench_cc_algorithms.py [replicates...] [--cpus N]
                                           [--deep N]
Defaults: replicates 64 128, cpus 32, memory durability (no disk floor;
the disk-mode pipeline bench lives in bench.py). One JSON line per run:
{"replicate", "algo", "docs", "wall_sec", "cc_stage_sec", "edges"}.

``--deep N`` adds the operator-level DEPTH case the pipeline graphs
never produce: a path graph of N nodes (diameter N-1), where min-label
propagation needs ~N rounds and star needs ~log N — the regime the
star algorithm exists for. Emits {"deep", "algo", "wall_sec",
"clusters"} lines.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    cpus, deep = 32, 0
    for a in sys.argv[1:]:
        if a.startswith("--cpus"):
            cpus = int(a.split("=", 1)[1])
        if a.startswith("--deep"):
            deep = int(a.split("=", 1)[1])
    replicates = [int(a) for a in args] or ([] if deep else [64, 128])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import build_replicated_documents
    from imageduplicatefinder_spark.config import DedupConfig
    from imageduplicatefinder_spark.plans.pipeline import DedupPipeline
    from imageduplicatefinder_spark.session import get_spark

    spark = get_spark(app_name="bench_cc_algorithms",
                      master=f"local[{cpus}]", shuffle_partitions=cpus)

    if replicates:
        # warm the Python workers / JIT off the clock
        warm = build_replicated_documents(spark, sf_dir, 1).limit(2000).cache()
        warm.count()
        for algo in ("labelprop", "star"):
            DedupPipeline(
                spark, DedupConfig(cc_algorithm=algo),
                checkpoint_dir=tempfile.mkdtemp(), durability="memory",
            ).run(warm).plan.count()
        warm.unpersist()

    for replicate in replicates:
        docs = build_replicated_documents(spark, sf_dir, replicate).cache()
        n_docs = docs.count()
        for algo in ("labelprop", "star"):
            pipe = DedupPipeline(
                spark, DedupConfig(cc_algorithm=algo),
                checkpoint_dir=tempfile.mkdtemp(prefix=f"cc_{algo}_"),
                durability="memory",
            )
            t0 = time.monotonic()
            res = pipe.run(docs)
            res.plan.count()
            wall = time.monotonic() - t0
            cc_stage = sum(
                m.wall_s for m in pipe.ckpt.metrics if m.stage == "components"
            )
            print(json.dumps({
                "replicate": replicate,
                "algo": algo,
                "docs": n_docs,
                "wall_sec": round(wall, 2),
                "cc_stage_sec": round(cc_stage, 2),
                "edges": res.edges.count(),
            }), flush=True)
        docs.unpersist()

    if deep:
        from pyspark.sql import functions as F

        from imageduplicatefinder_spark.operators.components import (
            connected_components,
            connected_components_star,
        )

        chain = spark.range(deep - 1).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        ).cache()
        chain.count()
        for algo, fn in (("labelprop", connected_components),
                         ("star", connected_components_star)):
            t0 = time.monotonic()
            comps = fn(chain, max_iterations=deep + 10)
            n_clusters = comps.select("cluster_id").distinct().count()
            wall = time.monotonic() - t0
            print(json.dumps({
                "deep": deep,
                "algo": algo,
                "wall_sec": round(wall, 2),
                "clusters": n_clusters,
            }), flush=True)
        chain.unpersist()


if __name__ == "__main__":
    main()
