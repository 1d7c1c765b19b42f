"""Structured Streaming operators.

The reference is strictly batch (SURVEY §2.7 — its web UI polls job
progress, which is telemetry, not data streaming). These operators are
the engine's forward-looking streaming surface for continuous ingest at
scale: new documents arrive on a stream, exact duplicates are dropped
within a watermark horizon, and per-window ingest stats feed the
metrics table.

Patterns used (all built-in, no custom state store logic):
- ``withWatermark + dropDuplicates([sha256])`` — streaming exact-dedup;
  state bounded by the watermark horizon.
- windowed groupBy counts — per-window ingest telemetry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(documents_stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Drop exact-duplicate documents (by content sha256) arriving
    within the watermark horizon. Input must carry an event-time
    column ``ts``; output keeps the first arrival of each content.

    Batch analog: the sha256 exact-dup pre-pass
    (operators/exact.py; ref BK-tree distance-0 merge,
    index/BKTreeIndex.java:27).
    """
    return (
        documents_stream.withColumn("sha256", F.sha2(F.col("content"), 256))
        .withWatermark("ts", watermark)
        .dropDuplicates(["sha256"])
    )


def ingest_window_stats(
    documents_stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-window ingest counts + byte totals by lang — the streaming
    metrics feed (north_rule: per-partition lineage + row-count metrics,
    streaming flavor)."""
    return (
        documents_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("content")).alias("total_bytes"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "lang",
            "n_docs",
            "total_bytes",
        )
    )
