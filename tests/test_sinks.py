"""Bucketed sink: co-located joins must skip the exchange."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from imageduplicatefinder_spark.sinks import (
    compact_parquet,
    read_table,
    write_bucketed,
)


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def warehouse(spark, tmp_path):
    yield tmp_path
    for t in ("t_clusters", "t_plan"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    clusters = spark.range(0, 2000).select(
        (F.col("id") % 97).alias("cluster_id"), F.col("id").alias("doc_id")
    )
    plan = spark.range(0, 97).select(
        F.col("id").alias("cluster_id"),
        F.when(F.col("id") % 2 == 0, "KEEP").otherwise("DELETE").alias("action"),
    )
    write_bucketed(clusters, "t_clusters", "cluster_id", num_buckets=8,
                   sort_col="cluster_id", path=str(warehouse / "c"))
    write_bucketed(plan, "t_plan", "cluster_id", num_buckets=8,
                   sort_col="cluster_id", path=str(warehouse / "p"))
    a = read_table(spark, "t_clusters")
    b = read_table(spark, "t_plan")
    # force sort-merge so the assertion is about bucketing, not broadcast
    joined = a.hint("merge").join(b.hint("merge"), on="cluster_id")
    p = plan_of(joined)
    assert "SortMergeJoin" in p, p
    assert "Exchange" not in p, p          # buckets co-locate both sides
    assert joined.count() == 2000
    # same-key aggregation also skips the exchange
    agg = plan_of(a.groupBy("cluster_id").agg(F.count("*")))
    assert "Exchange" not in agg, agg


def test_unbucketed_baseline_does_shuffle(spark):
    """Sanity: the exchange the sink removes is really there otherwise."""
    a = spark.range(0, 2000).select((F.col("id") % 97).alias("k"), "id")
    b = spark.range(0, 97).select(F.col("id").alias("k"))
    p = plan_of(a.hint("merge").join(b.hint("merge"), on="k"))
    assert "Exchange" in p


def test_compact_parquet(spark, tmp_path):
    src = str(tmp_path / "many")
    spark.range(0, 10000).repartition(64).write.parquet(src)
    dst = str(tmp_path / "few")
    n = compact_parquet(spark, src, dst, target_mb=128)
    assert n == 1  # tiny table -> single target-sized file
    out = spark.read.parquet(dst)
    assert out.count() == 10000
    files = {r[0] for r in out.select(F.input_file_name()).distinct().collect()}
    assert len(files) == 1
