"""Interop with the reference's CSV checkpoint formats (S5-S8).

A user migrating from the reference carries three artifacts:

- ``hashes.csv``   — ``path,unsignedHash`` lines, parsed on the LAST
  comma so paths containing commas survive; blank and comma-less lines
  skipped (ref: app/Commands.java:130-141, :87-94).
- ``clusters.csv`` — ``clusterId,path`` lines, parsed on the FIRST
  comma (clusterId is a UUID, never contains one; the path may)
  (ref: app/Commands.java:145-158, :190-198).
- ``plan.csv``     — 4-column CSV with header
  ``clusterId,action,path,reason``; unknown/missing actions coerce to
  ``keep`` on load (ref: app/Commands.java:200-237 write,
  WebServer.java:356-394 load).

These readers reproduce the reference's exact parsing semantics with
``spark.read.text`` + regex (the line formats are not quoted CSV, so a
generic CSV reader would mis-split comma-bearing paths), letting the
engine's distributed operators (Hamming-radius search, clustering,
keeper planning) run directly over checkpoints produced by the
reference. Hash values round-trip through Java's unsigned-long text
form: ``Long.parseUnsignedLong`` accepts values up to 2^64-1, which map
onto the engine's signed 64-bit sketch column two's-complement style.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# 2^63 / 2^64 exceed py4j's long, so they travel as string literals;
# built lazily because Column construction needs an active session
def _two63() -> F.Column:
    return F.lit(str(1 << 63)).cast("decimal(20,0)")


def _two64() -> F.Column:
    return F.lit(str(1 << 64)).cast("decimal(21,0)")


def _unsigned_str_to_long(col: F.Column) -> F.Column:
    """Java ``Long.parseUnsignedLong`` semantics: decimal text in
    [0, 2^64) -> signed 64-bit two's complement; out-of-range input
    RAISES like parseUnsignedLong throws (silently aliasing 2^64 to 0
    would invent Hamming-0 duplicates)."""
    d = col.cast("decimal(20,0)")
    valid = d.isNotNull() & (d < _two64().cast("decimal(21,0)"))
    return (
        F.when(valid, F.when(d >= _two63(), d - _two64()).otherwise(d))
        .otherwise(
            F.raise_error(
                F.concat(F.lit("hash out of unsigned-64 range: "), col)
            ).cast("decimal(21,0)")
        )
        .cast("long")
    )


def _long_to_unsigned_str(col: F.Column) -> F.Column:
    """Java ``Long.toUnsignedString``: signed long -> decimal text in
    [0, 2^64)."""
    d = col.cast("decimal(20,0)")
    return (
        F.when(d < 0, d + _two64())
        .otherwise(d)
        .cast("decimal(20,0)")
        .cast("string")
    )


def _required(col_name: str) -> F.Column:
    """NULL in a line-format sink would silently produce a malformed
    line that vanishes on re-read (concat_ws drops nulls) — raise
    instead. Returns the column with its original type; callers cast
    as they need."""
    c = F.col(col_name)
    return F.when(c.isNotNull(), c).otherwise(
        F.raise_error(F.lit(f"reference CSV sink: NULL {col_name}"))
    )


def read_reference_hashes(spark: SparkSession, path: str) -> DataFrame:
    """hashes.csv -> (path string, sketch long). Last-comma split;
    blank / comma-less lines skipped (ref: Commands.java:133-137)."""
    lines = spark.read.text(path)
    parsed = lines.select(
        F.regexp_extract("value", r"^(.+),\s*(\d+)\s*$", 1).alias("path"),
        F.regexp_extract("value", r"^(.+),\s*(\d+)\s*$", 2).alias("h"),
    )
    return parsed.filter(
        (F.length("path") > 0) & (F.length("h") > 0)
    ).select("path", _unsigned_str_to_long(F.col("h")).alias("sketch"))


def write_reference_hashes(
    df: DataFrame, out_dir: str, path_col: str = "path",
    sketch_col: str = "sketch",
) -> None:
    """(path, sketch) -> reference hashes.csv lines (ref:
    Commands.java:87-94). Distributed text sink: a directory of part
    files, each a valid hashes.csv fragment; ``coalesce(1)`` upstream
    for a single file."""
    df.select(
        F.concat(
            _required(path_col).cast("string"),
            F.lit(","),
            _long_to_unsigned_str(_required(sketch_col)),
        ).alias("value")
    ).write.mode("overwrite").text(out_dir)


def read_reference_clusters(spark: SparkSession, path: str) -> DataFrame:
    """clusters.csv -> (cluster_id string, path string). FIRST-comma
    split (ref: Commands.java:192-197)."""
    lines = spark.read.text(path)
    parsed = lines.select(
        F.regexp_extract("value", r"^([^,]+),(.*)$", 1).alias("cluster_id"),
        F.regexp_extract("value", r"^([^,]+),(.*)$", 2).alias("path"),
    )
    return parsed.filter(
        (F.length("cluster_id") > 0) & (F.length("path") > 0)
    )


def write_reference_clusters(
    df: DataFrame, out_dir: str, cluster_col: str = "cluster_id",
    path_col: str = "path",
) -> None:
    """(cluster_id, path) -> clusters.csv lines (ref:
    Commands.java:145-155; singleton-dropping is the caller's concern,
    as in the reference's write loop)."""
    df.select(
        F.concat(_required(cluster_col).cast("string"), F.lit(","),
                 _required(path_col).cast("string")).alias("value")
    ).write.mode("overwrite").text(out_dir)


def read_reference_plan(spark: SparkSession, path: str) -> DataFrame:
    """plan.csv -> (cluster_id, action, path, reason). Header-driven
    CSV; actions normalize to keep/delete with unknown -> keep
    (ref: WebServer.java:377-385).

    Quote handling is the doubled-quote convention (commons-csv
    DEFAULT, what the reference reads and writes). A plan written by a
    generic Spark ``df.write.csv`` without ``option("escape", '\"')``
    uses backslash escaping instead and needs that option adjusted on
    this reader — it is not a reference-format file."""
    raw = (
        spark.read.option("header", "true")
        # doubled-quote escaping (commons-csv DEFAULT convention, which
        # the reference's loader expects) and multiLine so quoted
        # newline-bearing reasons round-trip through our own writer
        .option("escape", '"')
        .option("multiLine", "true")
        .csv(path)
        .withColumnRenamed("clusterId", "cluster_id")
    )
    action = F.lower(F.trim(F.coalesce(F.col("action"), F.lit("keep"))))
    return raw.select(
        "cluster_id",
        F.when(action.isin("keep", "delete"), action)
        .otherwise(F.lit("keep"))
        .alias("action"),
        "path",
        F.coalesce(F.col("reason"), F.lit("")).alias("reason"),
    )


def write_reference_plan(df: DataFrame, out_dir: str) -> None:
    """(cluster_id, action, path, reason) -> reference-format plan.csv
    (header ``clusterId,action,path,reason``; quoted where needed, which
    the reference's commons-csv loader accepts — strictly safer than
    its own unquoted writer, whose comma-bearing reasons mis-split on
    reload, ref: Commands.java:222-232 vs WebServer.java:369-389)."""
    (
        df.select(
            F.col("cluster_id").alias("clusterId"), "action", "path", "reason"
        )
        .write.mode("overwrite")
        .option("header", "true")
        # escape = quote char -> doubled-quote escaping, the only form
        # commons-csv DEFAULT parses (Spark's default backslash escaping
        # would break the reference's loader on quote-bearing fields)
        .option("escape", '"')
        .csv(out_dir)
    )
