"""Stage checkpointing with per-partition lineage + row-count metrics.

The reference restarts stages manually from CSV files between commands
(hashes.csv -> clusters.csv -> plan.csv, ref: src/main/java/app/
Commands.java:87-94, :130-141, WebServer.java:88-103). Here every stage
writes a Parquet checkpoint under ``<root>/<stage>/<config_hash>/`` —
Iceberg-shaped layout: deterministic table identity per (stage, config),
a ``_meta.json`` sidecar, and rows appended to a ``_metrics`` table
(stage, config_hash, partition_id, rows, wall_s) so a resumed run can
prove which partitions it reused (north_rule: resumable mid-run with
per-partition lineage + metrics).

Resume rule: a stage whose checkpoint exists for the same config hash is
read back instead of recomputed (ref analog: WebServer job-progress
registry, app/WebServer.java:29-36, made durable).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageMetric:
    stage: str
    config_hash: str
    rows: int
    n_partitions: int
    wall_s: float
    reused: bool


@dataclass
class CheckpointManager:
    spark: SparkSession
    root: str
    config_hash: str
    metrics: list[StageMetric] = field(default_factory=list)
    _pending_metric_rows: list[tuple] = field(default_factory=list)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage, self.config_hash)

    def exists(self, stage: str) -> bool:
        d = self._dir(stage)
        return os.path.exists(os.path.join(d, "_meta.json")) and os.path.exists(
            os.path.join(d, "_SUCCESS")
        )

    def materialize(self, stage: str, df_fn, num_partitions: int | None = None) -> DataFrame:
        """Run ``df_fn()`` and checkpoint, or read back an existing
        checkpoint for this config. Records a metrics row either way."""
        d = self._dir(stage)
        t0 = time.monotonic()
        if self.exists(stage):
            out = self.spark.read.parquet(d)
            meta = json.load(open(os.path.join(d, "_meta.json")))
            self.metrics.append(
                StageMetric(stage, self.config_hash, meta["rows"],
                            meta["n_partitions"], time.monotonic() - t0, True)
            )
            return out

        df: DataFrame = df_fn()
        writer = df.write.mode("overwrite")
        if num_partitions:
            df = df.repartition(num_partitions)
            writer = df.write.mode("overwrite")
        writer.parquet(d)
        out = self.spark.read.parquet(d)

        # per-partition lineage: rows per output partition
        part_rows = (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .count()
            .collect()
        )
        rows = sum(r["count"] for r in part_rows)
        wall = time.monotonic() - t0
        meta = {
            "stage": stage,
            "config_hash": self.config_hash,
            "rows": rows,
            "n_partitions": len(part_rows),
            "wall_s": wall,
            "partitions": {str(r["partition_id"]): r["count"] for r in part_rows},
        }
        with open(os.path.join(d, "_meta.json"), "w") as f:
            json.dump(meta, f, indent=1)
        self.metrics.append(
            StageMetric(stage, self.config_hash, rows, len(part_rows), wall, False)
        )
        self._append_metrics_table(meta)
        return out

    def _append_metrics_table(self, meta: dict) -> None:
        # buffered: one tiny parquet append per stage would cost a Spark
        # job each; rows accumulate and flush once per pipeline run
        rows = [
            (meta["stage"], meta["config_hash"], int(pid), int(cnt),
             float(meta["wall_s"]))
            for pid, cnt in meta["partitions"].items()
        ] or [(meta["stage"], meta["config_hash"], -1, 0, float(meta["wall_s"]))]
        self._pending_metric_rows.extend(rows)

    def flush_metrics(self) -> None:
        if not self._pending_metric_rows:
            return
        mdf = self.spark.createDataFrame(
            self._pending_metric_rows,
            "stage string, config_hash string, partition_id int, "
            "rows long, wall_s double",
        )
        mdf.coalesce(1).write.mode("append").parquet(
            os.path.join(self.root, "_metrics")
        )
        self._pending_metric_rows = []

    def metrics_table(self) -> DataFrame:
        self.flush_metrics()
        return self.spark.read.parquet(os.path.join(self.root, "_metrics"))
