"""SparkSession factory tuned for this engine.

Local mode for tests/bench; the same settings are what we'd submit on a
real cluster via spark-submit --py-files (AQE on, Arrow on, UTC, shuffle
partitions sized to the stage, not the 200 default).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

# every valid local master shape: "local", "local[N]", "local[*]", and
# the retry form "local[N,M]" / "local[*,M]"
_LOCAL_MASTER = re.compile(r"local(?:\[(\*|\d+)(?:,\d+)?\])?$")


def _local_cores(master: str) -> int | None:
    """Parallelism implied by a local master string, or None if the
    master is not local (cluster managers size shuffles differently)."""
    m = _LOCAL_MASTER.fullmatch(master)
    if m is None:
        return None
    spec = m.group(1)
    if spec is None:       # bare "local" is single-threaded
        return 1
    if spec == "*":
        return os.cpu_count() or 1
    return int(spec)


def get_spark(
    app_name: str = "imageduplicatefinder_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # match parallelism in local mode instead of the 200 default
        shuffle_partitions = _local_cores(master) or 200

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelism-first coalescing only holds partitions at the core
        # count while they exceed minPartitionSize (default 1 MB). This
        # repo's CPU-heavy stages (array_intersect verify, UDF
        # fingerprints) often shuffle only a few MB, so the default
        # merges them below the core count and idles executors exactly
        # where compute is densest. 16 KB keeps AQE's empty-partition
        # cleanup while preserving parallelism; at cluster scale
        # partitions are far above either bound, so behavior there is
        # unchanged. (Measured: verify stage 7.2 s -> 5.6 s at
        # local[8] on the x64 bench workload.)
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # InferFiltersFromGenerate turns every explode(column) into an
        # inferred `size(col) > 0 AND isnotnull(col)` filter, and
        # predicate pushdown then INLINES the column's full defining
        # expression (split/transform/md5 chains here) into a Filter
        # evaluated below the first exchange — the generator expression
        # runs up to 3x, on the narrow pre-shuffle side (guide §7.2
        # "duplicated subtrees"). Measured on the 13-gram build at
        # sf1.0: 20.8 s -> 7.3 s from this exclusion alone. The rule
        # only prunes empty arrays before a Generate; correctness is
        # unaffected, and none of this repo's exploded arrays are
        # empty-heavy (grams/shingles/bands are >= 1 element by
        # construction).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # floor the SCAN parallelism at the session's shuffle width:
        # single-file local testdata otherwise plans 1-2 map tasks and
        # serializes every fused per-row stage (guide §6 input split
        # sizing). On a real cluster inputs have >> cores splits and
        # this floor is inert; it is a floor, not a split-size
        # override, so large sequential scans keep their natural
        # split size.
        .config("spark.sql.files.minPartitionNum", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch sizing (guide §4.2): the record cap exists to bound
        # per-batch memory for WIDE rows, but it also throttles narrow
        # ones — the verify kernel's (src,dst) pairs are 16 B/row, so a
        # 4096-row cap made ~65 KB batches and the per-batch Python
        # costs dominated (measured: the 45.6M-pair verify leg spent
        # ~60% of its wall on the Arrow boundary). Spark 4's
        # maxBytesPerBatch is the direct memory bound: cap bytes at
        # 16 MB (wide rows stop there) and let narrow rows batch up to
        # 64k records. Batch size never changes results — every kernel
        # here is batch-split independent (the streaming oracle test
        # pins that property explicitly).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "16m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
