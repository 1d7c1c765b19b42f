"""Pigeonhole bit-chunk Hamming LSH: exhaustiveness vs brute force
(the distributed form of the reference's BK-tree radius query,
ref: src/main/java/index/BKTreeIndex.java:34-50)."""

import random

import pytest
from pyspark.sql import functions as F

from imageduplicatefinder_spark.functions.fingerprints import hamming_distance_col
from imageduplicatefinder_spark.operators.hamming_lsh import (
    _chunk_widths,
    hamming_pairs,
)


def _brute(spark, df, radius):
    a = df.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = df.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    return {
        (r.doc_a, r.doc_b, r.hamming)
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "hamming", hamming_distance_col(F.col("sa"), F.col("sb")).cast("long")
        )
        .filter(F.col("hamming") <= radius)
        .collect()
    }


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


@pytest.fixture(scope="module")
def sketches(spark):
    """Random sketches plus planted near-misses: clones of a base with
    exactly r bits flipped for r in 0..12 (covers <=, ==, > radius)."""
    rng = random.Random(1234)
    rows = [(i, _to_signed(rng.getrandbits(64))) for i in range(120)]
    base = rng.getrandbits(64)
    nid = 1000
    for r in range(13):
        flipped = base
        for pos in rng.sample(range(64), r):
            flipped ^= 1 << pos
        rows.append((nid, _to_signed(flipped)))
        nid += 1
    # exact sketch duplicates (the same-sketch fast path)
    rows.append((2000, _to_signed(base)))
    rows.append((2001, _to_signed(base)))
    return spark.createDataFrame(rows, "doc_id long, simhash long")


def test_chunk_widths_cover_64_bits():
    for radius in (0, 1, 3, 10, 31):
        w = _chunk_widths(64, radius + 1)
        assert sum(w) == 64 and len(w) == radius + 1
        assert max(w) - min(w) <= 1


@pytest.mark.parametrize("radius", [0, 3, 10])
def test_hamming_pairs_equals_brute_force(spark, sketches, radius):
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in hamming_pairs(sketches, radius=radius).collect()
    }
    assert got == _brute(spark, sketches, radius)


def test_hamming_pairs_plan_has_no_cartesian(spark, sketches):
    plan = (
        hamming_pairs(sketches, radius=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
