"""As-of join and bucketed range join contracts (operators/temporal.py)."""

import datetime

import pytest

from imageduplicatefinder_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
)


def _ts(s: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


@pytest.fixture(scope="module")
def probe(spark):
    return spark.createDataFrame(
        [(1, 1, _ts(100)), (2, 1, _ts(50)), (3, 2, _ts(10)), (4, 3, _ts(500))],
        "event_id long, user_id long, ts timestamp",
    )


@pytest.fixture(scope="module")
def quote(spark):
    return spark.createDataFrame(
        [
            (10, 1, _ts(40), 1.0),
            (11, 1, _ts(100), 2.0),   # equal ts to probe 1 -> counts (<=)
            (12, 1, _ts(101), 3.0),   # after every probe of user 1
            (13, 2, _ts(99), 4.0),    # after probe 3 -> no match for user 2
        ],
        "q_id long, user_id long, ts timestamp, v double",
    )


def test_asof_picks_latest_at_or_before(spark, probe, quote):
    out = {
        r.event_id: r
        for r in asof_join(probe, quote, on="user_id", ts_col="ts",
                           quote_cols=["q_id", "v"]).collect()
    }
    assert out[1].asof_q_id == 11 and out[1].asof_v == 2.0  # equal ts wins
    assert out[2].asof_q_id == 10                           # latest <= 50
    assert 3 not in out                                     # no quote <= 10
    assert 4 not in out                                     # user 3 has no quotes


def test_asof_left_keeps_unmatched(spark, probe, quote):
    out = {
        r.event_id: r
        for r in asof_join(probe, quote, on="user_id", ts_col="ts",
                           quote_cols=["q_id", "v"], how="left").collect()
    }
    assert len(out) == 4
    assert out[3].asof_q_id is None and out[3].asof_ts is None


def test_asof_no_cartesian(spark, probe, quote):
    plan = (
        asof_join(probe, quote, on="user_id", ts_col="ts",
                  quote_cols=["q_id", "v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(0))], "lid long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (20, 1, _ts(0)),      # lag 0 -> included (closed lower bound)
            (21, 1, _ts(3599)),   # included
            (22, 1, _ts(3600)),   # excluded (open upper bound)
            (23, 1, _ts(7300)),   # cell l+2 -> never joined
            (24, 2, _ts(10)),     # other key
        ],
        "rid long, user_id long, ts timestamp",
    )
    got = {
        r.r_rid
        for r in range_join_bucketed(left, right, on="user_id",
                                     window_seconds=3600).collect()
    }
    assert got == {20, 21}


def test_range_join_crosses_cell_boundary(spark):
    # left at second 3000: its window [3000, 6600) spans cells 0 and 1
    left = spark.createDataFrame(
        [(1, 1, _ts(3000))], "lid long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(30, 1, _ts(4000)), (31, 1, _ts(6599)), (32, 1, _ts(6600))],
        "rid long, user_id long, ts timestamp",
    )
    got = {
        r.r_rid
        for r in range_join_bucketed(left, right, on="user_id",
                                     window_seconds=3600).collect()
    }
    assert got == {30, 31}


def test_range_join_subsecond_exact(spark):
    """The range predicate holds at microsecond precision: a right row
    0.5s BEFORE the left row is excluded (whole-second flooring would
    admit it), and a right row 0.5s inside the upper bound is included
    (flooring would push it out)."""
    us = datetime.timedelta(microseconds=1)
    left = spark.createDataFrame(
        [(1, 1, _ts(10) + 700_000 * us)],
        "lid long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (40, 1, _ts(10) + 200_000 * us),    # 0.5s BEFORE left -> out
            (41, 1, _ts(10) + 700_000 * us),    # lag 0 -> in
            (42, 1, _ts(3610) + 699_999 * us),  # 1us inside bound -> in
            (43, 1, _ts(3610) + 700_000 * us),  # exactly at bound -> out
        ],
        "rid long, user_id long, ts timestamp",
    )
    got = {
        r.r_rid
        for r in range_join_bucketed(left, right, on="user_id",
                                     window_seconds=3600).collect()
    }
    assert got == {41, 42}


def test_asof_reserved_probe_column_raises(spark, quote):
    """A probe column named like a working column must fail loudly —
    it would otherwise be silently clobbered in the output."""
    probe = spark.createDataFrame(
        [(1, 1, _ts(100), 9)],
        "event_id long, user_id long, ts timestamp, _side long",
    )
    with pytest.raises(ValueError, match="_side"):
        asof_join(probe, quote, on="user_id", ts_col="ts",
                  quote_cols=["q_id", "v"])


def test_asof_matched_quote_row_stays_atomic(spark):
    """A NULL column in the latest quote must come through as NULL —
    not be backfilled from an older quote (the matched row is atomic,
    matching DuckDB ASOF JOIN semantics)."""
    probe = spark.createDataFrame(
        [(1, 1, _ts(100))], "event_id long, user_id long, ts timestamp"
    )
    quote = spark.createDataFrame(
        [(10, 1, _ts(10), 5.0), (11, 1, _ts(50), None)],
        "q_id long, user_id long, ts timestamp, v double",
    )
    r = asof_join(probe, quote, on="user_id", ts_col="ts",
                  quote_cols=["q_id", "v"]).collect()[0]
    assert r.asof_q_id == 11
    assert r.asof_v is None  # NOT 5.0 from the older quote


def test_asof_equal_ts_quotes_deterministic(spark):
    """Two quotes in the same instant resolve to a deterministic winner
    (max by the quote struct), independent of partition layout."""
    probe = spark.createDataFrame(
        [(1, 1, _ts(100))], "event_id long, user_id long, ts timestamp"
    )
    rows = [(10, 1, _ts(100), 1.0), (11, 1, _ts(100), 2.0)]
    outs = set()
    for parts in (1, 5):
        quote = spark.createDataFrame(
            rows, "q_id long, user_id long, ts timestamp, v double"
        ).repartition(parts)
        r = asof_join(probe, quote, on="user_id", ts_col="ts",
                      quote_cols=["q_id", "v"]).collect()[0]
        outs.add((r.asof_q_id, r.asof_v))
    assert len(outs) == 1


def test_asof_null_ts_and_null_key_quotes_never_match(spark):
    """SQL ASOF semantics: a NULL-ts quote satisfies no >= predicate
    and NULL keys never join — neither may be carried as a match."""
    probe = spark.createDataFrame(
        [(1, 1, _ts(5))], "event_id long, user_id long, ts timestamp"
    )
    quote = spark.createDataFrame(
        [(10, 1, None, 7.0), (11, None, _ts(1), 8.0)],
        "q_id long, user_id long, ts timestamp, v double",
    )
    inner = asof_join(probe, quote, on="user_id", ts_col="ts",
                      quote_cols=["q_id", "v"]).collect()
    assert inner == []  # no fabricated match
    left = asof_join(probe, quote, on="user_id", ts_col="ts",
                     quote_cols=["q_id", "v"], how="left").collect()
    assert len(left) == 1 and left[0].asof_q_id is None
