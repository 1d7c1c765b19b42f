"""Structured Streaming operators.

The reference is strictly batch (SURVEY §2.7 — its web UI polls job
progress, which is telemetry, not data streaming). These operators are
the engine's forward-looking streaming surface for continuous ingest at
scale: new documents arrive on a stream, exact duplicates are dropped
within a watermark horizon, and per-window ingest stats feed the
metrics table.

Patterns used:
- ``withWatermark + dropDuplicatesWithinWatermark([sha256])`` —
  streaming exact-dedup with state actually bounded by the watermark
  horizon (plain ``dropDuplicates`` never evicts keys: the watermark
  only filters late rows, so state grows without bound and duplicates
  arriving after the horizon are still suppressed — the documented
  reason dropDuplicatesWithinWatermark exists).
- windowed groupBy counts — per-window ingest telemetry.
- ``applyInPandasWithState`` — custom stateful operator tracking, per
  content hash, the first-seen arrival and a running duplicate count
  (the streaming analog of the exact-dup pre-pass with per-class
  statistics the batch path gets from groupBy).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(documents_stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Drop exact-duplicate documents (by content sha256) arriving
    within the watermark horizon. Input must carry an event-time
    column ``ts``; output keeps the first arrival of each content.

    State is evicted once a key falls behind the watermark
    (``dropDuplicatesWithinWatermark``), so a continuous stream holds
    one state row per distinct content seen within the horizon — NOT
    per distinct content ever. A duplicate arriving after the horizon
    is re-emitted by design (the batch pipeline's exact pre-pass is
    the global dedup; this operator bounds in-flight duplication).

    Batch analog: the sha256 exact-dup pre-pass
    (operators/exact.py; ref BK-tree distance-0 merge,
    index/BKTreeIndex.java:27).
    """
    return (
        documents_stream.withColumn("sha256", F.sha2(F.col("content"), 256))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["sha256"])
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
            # octet_length, not length: length() counts characters, which
            # under-reports UTF-8 multibyte ingest volume up to 4x
            F.sum(F.octet_length("content")).alias("total_bytes"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "lang",
            "n_docs",
            "total_bytes",
        )
    )


def incremental_dedup(
    documents_stream: DataFrame,
    history_signatures: DataFrame,
    cfg,
    edges_out: str,
    checkpoint_dir: str,
):
    """Continuous near-dup detection of NEW documents against an
    existing corpus — the streaming form of the batch pipeline's
    candidate/verify stages, via ``foreachBatch``:

    each micro-batch is fingerprinted (same Arrow UDF as the batch
    path), banded, and its bands equi-joined against the UNION of the
    historical band table and the batch's own bands — so a new doc
    pairs both with history and with other docs in the same batch.
    Candidates are verified with the standard Jaccard/containment rule
    and verified edges land under ``edges_out`` (parquet, one partition
    per batch_id, replay-idempotent), ready for a periodic
    connected-components pass. Hot-band cap drops are recorded per batch
    at ``<edges_out>_band_stats`` (capped_bands' visibility contract).

    The historical band table is computed once (not per batch); at
    scale it would be the checkpointed ``bands`` stage of the last
    batch run. Returns the started StreamingQuery's writer (call
    ``.start()``-equivalent semantics: this function starts it).
    """
    from pyspark.sql import functions as SF

    from imageduplicatefinder_spark.operators.lsh import band_table, capped_bands
    from imageduplicatefinder_spark.operators.signatures import compute_signatures
    from imageduplicatefinder_spark.operators.verify import verify_pairs

    # hot-band cap on the HISTORY side, same as the batch pipeline: a
    # mega-band in the corpus (license boilerplate) would otherwise fan
    # every colliding new doc out O(band_size) per micro-batch
    hist_bands, hist_stats = capped_bands(band_table(history_signatures, cfg), cfg)
    hist_bands = hist_bands.localCheckpoint(eager=False)
    hist_stats = hist_stats.filter(SF.col("capped")).localCheckpoint(eager=False)
    hist_sigs = history_signatures
    stats_out = edges_out.rstrip("/") + "_band_stats"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sigs = compute_signatures(
            batch_df.select("repo", "path", "commit", "lang", "content"), cfg
        ).localCheckpoint(eager=True)
        # cap the batch's own bands too: with trigger(availableNow) a
        # whole backlog can land in one batch, and an uncapped mega-band
        # (license boilerplate) self-pairs quadratically on one
        # (band_id, band_hash) key — the exact skew capped_bands exists for
        new_bands, new_stats = capped_bands(band_table(sigs, cfg), cfg)
        # capped_bands' contract: drops must be visible, not silent —
        # persist the capped-band stats (history + this batch) next to
        # the edges, replayed idempotently per batch_id like the edges
        (
            hist_stats.withColumn("side", SF.lit("history"))
            .unionByName(
                new_stats.filter(SF.col("capped")).withColumn(
                    "side", SF.lit("batch")
                )
            )
            .withColumn("batch_id", SF.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(stats_out)
        )
        all_bands = hist_bands.unionByName(new_bands)
        cands = (
            new_bands.withColumnRenamed("doc_id", "new_id")
            .join(all_bands, on=["band_id", "band_hash"])
            .filter(SF.col("new_id") != SF.col("doc_id"))
            .select(
                SF.least("new_id", "doc_id").alias("src"),
                SF.greatest("new_id", "doc_id").alias("dst"),
            )
            .distinct()
        )
        # allowMissingColumns: a minhash-only history table unions with
        # NULL shingles; verify_pairs falls back to the MinHash jaccard
        # estimate per mixed row (see operators/verify.py)
        combined = hist_sigs.unionByName(sigs, allowMissingColumns=True)
        edges = verify_pairs(
            cands, combined, cfg, allow_null_shingles=True
        ).filter(SF.col("verified"))
        # foreachBatch is at-least-once: partition by batch_id and
        # dynamically overwrite that partition so a replayed batch
        # replaces its own output instead of appending duplicate edges
        (
            edges.withColumn("batch_id", SF.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(edges_out)
        )

    return (
        documents_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


DUP_STATE_OUTPUT = (
    "sha256 string, first_path string, first_ts timestamp, dup_count long"
)
DUP_STATE_SCHEMA = "first_path string, first_ts timestamp, dup_count long"


def stateful_dup_tracker(documents_stream: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: for each
    content sha256, keep (first_path, first_ts, dup_count) in the state
    store and emit an updated row whenever new arrivals land.

    Unlike ``dropDuplicates`` (which only suppresses), this surfaces
    duplicate PRESSURE per content class — the continuous-ingest signal
    a training-data pipeline alerts on (a sudden flood of one blob).
    State is per-key and incremental: arbitrarily long streams hold one
    small row per distinct content.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def track(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        first_path, first_ts, dup_count = (
            state.get if state.exists else (None, None, 0)
        )
        # a hot key's rows can span several Arrow chunks (4096-row
        # batches); first-seen must be the global (ts, path) minimum
        # across ALL chunks, not the head of whichever chunk arrived
        # first — so accumulate a candidate minimum and a total count,
        # then settle first/dup_count once at the end
        n_new = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n_new += len(pdf)
            head = pdf.sort_values(["ts", "path"]).iloc[0]
            if first_ts is None or (head["ts"], head["path"]) < (first_ts, first_path):
                if first_ts is not None:
                    dup_count += 1  # the displaced first-seen becomes a dup
                first_path, first_ts = head["path"], head["ts"]
                n_new -= 1  # the new first-seen row is not a duplicate
        dup_count += n_new
        state.update((first_path, first_ts, dup_count))
        yield pd.DataFrame(
            {
                "sha256": [key[0]],
                "first_path": [first_path],
                "first_ts": [first_ts],
                "dup_count": [dup_count],
            }
        )

    hashed = documents_stream.withColumn("sha256", F.sha2(F.col("content"), 256))
    return hashed.groupBy("sha256").applyInPandasWithState(
        track,
        outputStructType=DUP_STATE_OUTPUT,
        stateStructType=DUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_documents_jsonl(
    spark,
    path: str,
    bad_lines: str = "skip",
    max_files_per_trigger: int | None = 64,
) -> DataFrame:
    """Continuous JSONL ingest: ``readStream`` over a directory of
    JSONL shards with the SAME explicit schema and per-line corrupt-
    record policy as the batch reader (sources/jsonl.py) — drop the
    result into ``dedup_stream``/``incremental_dedup`` for streaming
    dedup of an arriving crawl.

    ``max_files_per_trigger`` bounds micro-batch size (a backlog of
    10^6 shards must not become one giant first batch); None leaves
    Spark's default.
    """
    from pyspark.sql import types as T

    from imageduplicatefinder_spark.sources.jsonl import (
        _CORRUPT_COL,
        DOCUMENTS_JSONL_SCHEMA,
    )

    if bad_lines not in ("skip", "keep"):
        # FAILFAST aborts a continuous query on one bad line — never
        # what a 24/7 ingest wants, so it is not offered here
        raise ValueError(f"unknown bad_lines policy {bad_lines!r}")
    full = T.StructType(
        list(DOCUMENTS_JSONL_SCHEMA.fields)
        + [T.StructField(_CORRUPT_COL, T.StringType())]
    )
    # text + from_json, same as the batch reader: the JSON source
    # forbids plans whose scan references only the corrupt column
    # (e.g. an aggregate-only sink after skip-mode pruning); from_json
    # honors the identical PERMISSIVE corrupt-record contract without
    # that restriction.
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = (
        reader.text(path)
        .filter(F.trim(F.col("value")) != "")
        .select(
            F.from_json(
                "value",
                full,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT_COL},
            ).alias("_j")
        )
        .select("_j.*")
    )
    if bad_lines == "keep":
        return df
    return df.filter(F.col(_CORRUPT_COL).isNull()).drop(_CORRUPT_COL)
