"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Both are expressed as compositions of existing DataFrame operators (the
preferred strategy for custom operators — no UDF, no cartesian):

- ``asof_join``: for every probe row, the LATEST quote row of the same
  key with quote.ts <= probe.ts — the canonical time-series enrichment
  join. Distributed shape: union the two sides with a side tag, one
  window per key ordered by (ts, side) carrying the last non-null quote
  columns forward, then keep probe rows. ONE shuffle on the key; no
  per-row probing. Quote rows sort before probe rows at equal ts, so
  ties resolve as ``<=`` (DuckDB ASOF JOIN semantics, the oracle).

- ``range_join_bucketed``: pairs (left, right) of the same key with
  right.ts in [left.ts, left.ts + window). A naive range join plans a
  cartesian/BNL; the distributed form buckets time into window-sized
  cells, explodes the LEFT side to the (at most 2) cells its interval
  touches, equi-joins on (key, cell), and applies the exact range as a
  residual filter. Shuffle volume is 2x the left side, never O(n^2).

Scale notes: the as-of window partitions by key — a mega-key (one user
with millions of events) serializes onto one task; the standard remedy
is range-bucketing the window with boundary-row carryover, which this
module trades away for simplicity since event streams key on
user/device ids with bounded per-key cardinality. The range join has
no such limit (cells bound the group size via the time dimension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _epoch_us(col: Column) -> Column:
    """Integer epoch-microseconds of a timestamp column. ``unix_micros``
    only accepts TIMESTAMP (with zone); parquet tables here carry
    TIMESTAMP_NTZ, so cast first — exact under the engine's pinned UTC
    session timezone (session.py), where NTZ wall time == UTC instant."""
    return F.unix_micros(col.cast("timestamp"))


def asof_join(
    probe: DataFrame,
    quote: DataFrame,
    on: str,
    ts_col: str = "ts",
    quote_cols: list[str] | None = None,
    prefix: str = "asof_",
    how: str = "inner",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """For each probe row, attach the latest quote (same ``on`` key,
    quote ts <= probe ts). Output = probe columns + prefixed quote
    columns (including ``<prefix><ts_col>``). ``how='inner'`` drops
    probes with no preceding quote; ``'left'`` keeps them with nulls.

    Equal-timestamp quotes resolve deterministically by ordering on
    ``tiebreak_cols`` (default: all quote_cols — which therefore must
    be ORDERABLE types; pass an explicit orderable subset, e.g. a quote
    id, when the payload carries maps or other unorderable columns).
    """
    if quote_cols is None:
        quote_cols = [c for c in quote.columns if c not in (on, ts_col)]
    if tiebreak_cols is None:
        tiebreak_cols = quote_cols
    # the union/window machinery reserves these working names; a probe
    # column with the same name would be silently clobbered (e.g. a
    # user `_side` column becomes the constant 1 in every output row)
    reserved = {"_side", "_q", "_qord", "_qrow"}
    clash = reserved.intersection(probe.columns)
    if clash:
        raise ValueError(
            f"probe columns {sorted(clash)} collide with asof_join's "
            "reserved working columns; rename them before joining"
        )
    # SQL ASOF semantics for nulls: a NULL-ts quote satisfies no
    # ``probe.ts >= quote.ts`` predicate and a NULL key matches no key —
    # drop them up front (the window would otherwise sort a NULL-ts
    # quote FIRST and carry it as a fabricated match, and partitionBy
    # groups NULL keys together unlike an equality join)
    quote = quote.filter(F.col(on).isNotNull() & F.col(ts_col).isNotNull())
    # the quote row is carried as ONE struct so the matched quote stays
    # atomic — carrying columns independently with last(ignorenulls)
    # would backfill a NULL column of the latest quote from an OLDER
    # quote, fabricating a row that never existed (and diverging from
    # ASOF JOIN, which returns the matched row's NULL as-is)
    q = quote.select(
        on,
        ts_col,
        F.struct(
            F.col(ts_col).alias("_qts"), *[F.col(c) for c in quote_cols]
        ).alias("_q"),
        F.struct(*[F.col(c) for c in tiebreak_cols]).alias("_qord"),
        F.lit(0).alias("_side"),
    )
    p = probe.withColumn("_side", F.lit(1))
    unioned = p.unionByName(q, allowMissingColumns=True)

    # (ts, side, _qord): quotes sort before probes at equal ts (<= tie
    # semantics), and the tiebreak struct makes the order among
    # equal-ts quotes TOTAL — without it two quotes in the same instant
    # resolve to a partition-order-dependent winner (nondeterministic
    # across runs). Probe rows all carry a null tiebreak, so the third
    # key is constant within side=1 and cannot reorder them relative to
    # quotes (side is the earlier key).
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_qord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(F.col("_q"), ignorenulls=True).over(w).alias("_qrow")

    out = (
        unioned.select("*", carried)
        .filter(F.col("_side") == 1)
        .select(
            *[c for c in probe.columns],
            *[F.col(f"_qrow.{c}").alias(f"{prefix}{c}") for c in quote_cols],
            F.col("_qrow._qts").alias(f"{prefix}{ts_col}"),
        )
    )
    if how == "inner":
        out = out.filter(F.col(f"{prefix}{ts_col}").isNotNull())
    elif how != "left":
        raise ValueError(f"unknown how {how!r}")
    return out


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    window_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Pairs of (left, right) rows sharing ``on`` with
    ``left_ts <= right_ts < left_ts + window_seconds`` — WITHOUT a
    cartesian/BNL plan: both sides get a cell id
    ``floor(epoch/window)``, the left side explodes to its cell and the
    next (its window spans at most two cells), the join is an equi-join
    on (key, cell), and the exact range is a residual filter.

    Output: every column of ``left`` plus right's columns prefixed
    ``r_`` (``r_<right_ts>`` is the matched timestamp).

    The range predicate is evaluated at FULL microsecond precision
    (Spark timestamps are epoch-micros internally): whole-second
    flooring would admit a right row up to 1s BEFORE the left row and
    drop in-window rows near the upper bound. Integer micros keep the
    cell ids and the residual filter exact.
    """
    window_us = int(window_seconds) * 1_000_000
    cell_l = F.floor(_epoch_us(F.col(left_ts)) / window_us)
    lt = left.withColumn(
        "_cell", F.explode(F.array(cell_l, cell_l + 1))
    )
    rcols = [F.col(c).alias(f"r_{c}") for c in right.columns if c != on]
    rt = right.select(on, *rcols).withColumn(
        "_cell", F.floor(_epoch_us(F.col(f"r_{right_ts}")) / window_us)
    )
    lo = _epoch_us(F.col(left_ts))
    hi = lo + window_us
    r_epoch = _epoch_us(F.col(f"r_{right_ts}"))
    return (
        lt.join(rt, on=[on, "_cell"])
        .filter((r_epoch >= lo) & (r_epoch < hi))
        .drop("_cell")
    )
