"""Exact verification of LSH candidate pairs.

The reference verifies candidates with ``hamming(a, b) <= radius``
inside the BK-tree walk (ref: src/main/java/index/BKTreeIndex.java:42-43,
hash/Hamming.java:4-6). Here verification is a post-join filter, fully
JVM-side:

- ``hamming``  = bit_count(simhash_a XOR simhash_b)            (64-bit)
- ``jaccard``  = exact shingle-set Jaccard via array_intersect, or the
                 MinHash estimate (fraction of equal signature slots)
                 when shingle sets weren't materialized
- ``containment`` = |A ∩ B| / min(|A|,|B|) — catches the watermark
                 analog (base content embedded in a larger host file,
                 FIXTURES.md §3 `containment`), which plain Jaccard
                 misses because the size ratio caps it.

A pair is verified if jaccard >= threshold OR containment >=
containment_threshold, optionally OR hamming <= radius when
``cfg.use_simhash_verify`` (the reference's exact predicate — loose for
text payloads, see DedupConfig).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from imageduplicatefinder_spark.config import DedupConfig
from imageduplicatefinder_spark.functions.fingerprints import hamming_distance_col


def _attach(pairs: DataFrame, signatures: DataFrame, side: str,
            cols: list[str]) -> DataFrame:
    sel = signatures.select(
        F.col("doc_id").alias(side), *[F.col(c).alias(f"{c}_{side}") for c in cols]
    )
    return pairs.join(sel, on=side)


def _minhash_estimate() -> F.Column:
    """Unbiased Jaccard estimate: fraction of equal signature slots
    (expects minhash_src/minhash_dst attached). NULL signatures -> 0.0."""
    eq = F.size(
        F.filter(
            F.zip_with("minhash_src", "minhash_dst", lambda x, y: x == y),
            lambda v: v,
        )
    )
    return F.coalesce(eq / F.size("minhash_src"), F.lit(0.0))


def verify_pairs(
    pairs: DataFrame,
    signatures: DataFrame,
    cfg: DedupConfig,
    allow_null_shingles: bool = False,
) -> DataFrame:
    """(src,dst) candidates -> verified edges with evidence columns.

    Output: src, dst, hamming:int, jaccard:double, containment:double,
    verified:boolean. Keep only verified rows for clustering; the full
    frame (pre-filter) is useful for threshold tuning.

    ``allow_null_shingles``: set when ``signatures`` is a union of a
    shingled table with a minhash-only one (incremental_dedup joining a
    fresh batch against a footprint-trimmed history) — mixed pairs then
    fall back to the MinHash jaccard estimate per row, at the cost of
    also shuffling the minhash arrays onto every pair. Off by default:
    the batch pipeline's signatures are fully shingled and must not pay
    that (~2 KB/pair) join payload for a fallback that can never fire.
    When off, a pair with a NULL shingle side gets NULL
    jaccard/containment/verified (unknown — dropped by a
    filter(verified) — never a silent 0.0).
    """
    has_shingles = "shingles" in signatures.columns
    has_minhash = "minhash" in signatures.columns
    use_fallback = allow_null_shingles and has_shingles and has_minhash
    cols = ["simhash"]
    if has_shingles:
        cols.append("shingles")
    if not has_shingles or use_fallback:
        cols.append("minhash")  # estimate path / per-row NULL fallback
    df = _attach(_attach(pairs, signatures, "src", cols), signatures, "dst", cols)

    df = df.withColumn(
        "hamming", hamming_distance_col(F.col("simhash_src"), F.col("simhash_dst"))
    )
    if has_shingles:
        inter = F.size(F.array_intersect("shingles_src", "shingles_dst"))
        sa = F.size("shingles_src")
        sb = F.size("shingles_dst")
        union = sa + sb - inter
        both = F.col("shingles_src").isNotNull() & F.col("shingles_dst").isNotNull()
        if use_fallback:
            # containment has no symmetric-MinHash estimator, so mixed
            # pairs get containment 0.0 (embedded-snippet dups need
            # shingles on both sides); jaccard falls back to the estimate
            mixed_jaccard = _minhash_estimate()
            mixed_containment = F.lit(0.0)
        else:
            mixed_jaccard = F.lit(None).cast("double")
            mixed_containment = F.lit(None).cast("double")
        df = (
            df.withColumn("_inter", inter)
            .withColumn(
                "jaccard",
                F.when(
                    both,
                    F.when(union > 0, F.col("_inter") / union).otherwise(F.lit(0.0)),
                ).otherwise(mixed_jaccard),
            )
            .withColumn(
                "containment",
                F.when(
                    both,
                    F.when(
                        F.least(sa, sb) > 0, F.col("_inter") / F.least(sa, sb)
                    ).otherwise(F.lit(0.0)),
                ).otherwise(mixed_containment),
            )
            .drop("_inter")
        )
    else:
        # MinHash estimate: fraction of equal signature slots is an
        # unbiased estimator of Jaccard similarity. Containment has NO
        # symmetric-MinHash estimator, so the containment >= threshold
        # clause of the verify rule is INACTIVE in this mode — warn
        # loudly: embedded/watermark-style duplicates (low Jaccard, high
        # containment) will not verify without shingle sets.
        import warnings

        warnings.warn(
            "verify_pairs: signatures carry no shingle sets — containment "
            "verification is disabled (containment=0.0 for every pair); "
            "embedded-snippet duplicates will NOT be detected. Compute "
            "signatures with keep_shingles=True for full recall.",
            RuntimeWarning,
            stacklevel=2,
        )
        df = df.withColumn("jaccard", _minhash_estimate()).withColumn(
            "containment", F.lit(0.0)
        )

    rule = (F.col("jaccard") >= F.lit(cfg.jaccard_threshold)) | (
        F.col("containment") >= F.lit(cfg.containment_threshold)
    )
    if cfg.use_simhash_verify:
        rule = rule | (F.col("hamming") <= F.lit(cfg.hamming_radius))
    df = df.withColumn("verified", rule)
    return df.select(
        "src", "dst", "hamming", "jaccard", "containment", "verified"
    )
