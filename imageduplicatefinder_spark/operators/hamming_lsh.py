"""Hamming-radius search via pigeonhole bit-chunk LSH.

Distributed replacement for the reference's BK-tree radius query over
64-bit sketches (ref: src/main/java/index/BKTreeIndex.java:34-50
``withinHamming`` — pointer-chasing DFS with triangle-inequality
pruning). The distributed formulation is the pigeonhole principle:
split the 64-bit sketch into ``radius + 1`` disjoint bit chunks — a
pair within Hamming distance ``radius`` has at most ``radius``
differing bits, which can touch at most ``radius`` chunks, so AT LEAST
ONE chunk is bit-identical. Equi-joining on (chunk_id, chunk_value)
therefore finds EVERY pair within the radius (no recall loss — this is
exhaustive, unlike MinHash banding); ``bit_count(a XOR b) <= radius``
verifies JVM-side (ref: hash/Hamming.java:4-6).

Scale shape:
- the chunk join runs over DISTINCT sketch values, not documents — the
  dominant skew source (many docs sharing one sketch, e.g. boilerplate
  families) collapses to one row before the explode, and same-sketch
  doc pairs are emitted by a separate cheap equi-join on the sketch;
- candidate dedup is a distinct() on sketch pairs (bounded by the
  verified output size x chunk count, not by doc pairs);
- chunk values are 5-6 bits at radius 10; residual hot chunk values
  (e.g. an all-zero chunk across many sketches) are AQE skew-join
  territory — selectivity improves as radius shrinks (wider chunks).

Works for ANY 64-bit sketch family (SimHash, the gradient-sign family
in functions/fingerprints.py, or an externally-computed pHash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from imageduplicatefinder_spark.functions.fingerprints import hamming_distance_col


def _chunk_widths(bits: int, n_chunks: int) -> list[int]:
    base, rem = divmod(bits, n_chunks)
    return [base + 1] * rem + [base] * (n_chunks - rem)


def sketch_chunks(sketches: DataFrame, radius: int,
                  sketch_col: str = "simhash") -> DataFrame:
    """(sketch, chunk_id, chunk_val) for the radius+1 pigeonhole chunks
    of each DISTINCT sketch value. Pure JVM bit arithmetic."""
    widths = _chunk_widths(64, radius + 1)
    exprs = []
    off = 0
    for w in widths:
        # w == 64 (radius 0, one chunk): the all-ones mask as signed long
        mask = -1 if w == 64 else (1 << w) - 1
        exprs.append(
            F.shiftrightunsigned(F.col(sketch_col), off)
            .bitwiseAND(F.lit(mask))
        )
        off += w
    return (
        sketches.select(F.col(sketch_col).alias("sketch"))
        .distinct()
        .select("sketch", F.posexplode(F.array(*exprs)).alias("chunk_id",
                                                              "chunk_val"))
    )


def hamming_pairs(
    sketches: DataFrame,
    radius: int = 10,
    id_col: str = "doc_id",
    sketch_col: str = "simhash",
) -> DataFrame:
    """ALL pairs of rows within ``radius`` Hamming distance of each
    other on a 64-bit sketch column — exhaustive (pigeonhole chunk LSH,
    see module docstring), no cartesian product in the plan.

    Output: (doc_a, doc_b, hamming) with doc_a < doc_b,
    hamming = bit_count(sketch_a XOR sketch_b) <= radius.
    """
    if not 0 <= radius <= 31:
        # radius >= 32 means "more than half the bits differ" — beyond
        # any duplicate semantics — and the chunk widths collapse
        # (width 1 at r=31; width 0 at r>=64 would silently turn the
        # candidate equi-join into a disguised cross join)
        raise ValueError(
            f"hamming radius {radius} out of range [0, 31]: pigeonhole "
            "chunking degenerates (and the result would be meaningless "
            "for 64-bit sketches anyway)"
        )
    sig = sketches.select(F.col(id_col).alias("_id"),
                          F.col(sketch_col).alias("sketch"))
    # the sketch table is consumed five times below (chunk explode, two
    # doc-mapping joins, two same-sketch join sides); without a
    # materialization each consumer re-runs the upstream sketch
    # computation (measured 3x wall on the portable-simhash caller)
    sig = sig.localCheckpoint(eager=False)
    chunks = sketch_chunks(sig, radius, sketch_col="sketch")
    # a self-join scans its input twice; materialize the tiny distinct
    # sketch->chunk table instead of recomputing the upstream lineage
    chunks = chunks.localCheckpoint(eager=False)

    cand = (
        chunks.select("chunk_id", "chunk_val", F.col("sketch").alias("sk_a"))
        .join(
            chunks.select("chunk_id", "chunk_val",
                          F.col("sketch").alias("sk_b")),
            on=["chunk_id", "chunk_val"],
        )
        .filter(F.col("sk_a") < F.col("sk_b"))
        .select("sk_a", "sk_b")
        .distinct()
    )
    close = cand.withColumn(
        "hamming",
        hamming_distance_col(F.col("sk_a"), F.col("sk_b")).cast("long"),
    ).filter(F.col("hamming") <= radius)

    # map sketch pairs back to document pairs (sk_a != sk_b, so each
    # unordered doc pair appears exactly once; normalize by id)
    diff = (
        close.join(sig.select(F.col("_id").alias("id_a"),
                              F.col("sketch").alias("sk_a")), on="sk_a")
        .join(sig.select(F.col("_id").alias("id_b"),
                         F.col("sketch").alias("sk_b")), on="sk_b")
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
            "hamming",
        )
    )
    # same-sketch doc pairs: hamming 0, never seen by the chunk join
    same = (
        sig.alias("p")
        .join(sig.alias("q"), on="sketch")
        .filter(F.col("p._id") < F.col("q._id"))
        .select(
            F.col("p._id").alias("doc_a"),
            F.col("q._id").alias("doc_b"),
            F.lit(0).cast("long").alias("hamming"),
        )
    )
    return diff.union(same)
