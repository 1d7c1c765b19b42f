"""Table sinks tuned for downstream reuse at scale.

The reference persists results as flat files a web UI reloads (ref:
src/main/java/app/Commands.java:87-94 hash file, :145-158 clusters
file). At 100 TB the dominant cost of RE-USING a persisted table is the
shuffle every downstream join/aggregation would pay again, so the
Spark-first sink is a BUCKETED table: rows are hash-partitioned into a
fixed number of buckets on the join key at write time, and every later
equi-join or groupBy on that key reads co-located buckets with NO
exchange in the plan (asserted in tests/test_sinks.py).

``compact_parquet`` is the companion small-files maintenance pass: file
sources (sources/files.py) and streaming micro-batches produce many
small files; scan parallelism and footer overhead degrade unless they
are periodically rewritten to target-sized files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted)
    table. Joins/aggregations between tables bucketed on the same key
    with the same bucket count skip the exchange entirely; per-bucket
    sort additionally skips the sort of a sort-merge join.

    ``path`` makes it an external table (data at the given location);
    otherwise it lands in the session warehouse dir.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — REQUIRED for bucketed tables: reading the parquet
    directory directly loses the bucket metadata and every downstream
    join shuffles again."""
    return spark.table(table)


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_mb: int = 128,
) -> int:
    """Rewrite a parquet directory into ~``target_mb``-sized files.
    Returns the number of output files chosen. Sizing reads only
    footer/file metadata (an input_file_name distinct count would scan;
    the Hadoop listing is free)."""
    df = spark.read.parquet(src_dir)
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src_dir)
    fs = p.getFileSystem(hconf)
    total = fs.getContentSummary(p).getLength()
    n_files = max(1, int(total / (target_mb * 1024 * 1024)) + (
        1 if total % (target_mb * 1024 * 1024) else 0
    ))
    # repartition (not coalesce): coalesce(1) on a wide plan collapses
    # UPSTREAM parallelism into the single output task
    df.repartition(n_files).write.mode("overwrite").parquet(dst_dir)
    return n_files
