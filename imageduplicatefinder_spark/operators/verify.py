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


def verify_pairs(
    pairs: DataFrame, signatures: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """(src,dst) candidates -> verified edges with evidence columns.

    Output: src, dst, hamming:int, jaccard:double, containment:double,
    verified:boolean. Keep only verified rows for clustering; the full
    frame (pre-filter) is useful for threshold tuning.
    """
    has_shingles = "shingles" in signatures.columns
    has_minhash = "minhash" in signatures.columns
    cols = ["simhash"]
    if has_shingles:
        cols.append("shingles")
    if not has_shingles or has_minhash:
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
        # Per-row fallback: a union of a shingle-bearing table with a
        # minhash-only one (incremental_dedup joining a fresh batch
        # against a footprint-trimmed historical corpus) leaves NULL
        # shingles on one side. array_intersect(NULL, x) is NULL, which
        # would silently zero jaccard/containment for every mixed pair —
        # instead estimate jaccard from the MinHash signatures when they
        # were kept (containment has no symmetric-MinHash estimator, so
        # it stays 0.0 for mixed pairs: embedded-snippet dups need
        # shingles on both sides).
        if has_minhash:
            est = F.coalesce(
                F.size(
                    F.filter(
                        F.zip_with("minhash_src", "minhash_dst", lambda x, y: x == y),
                        lambda v: v,
                    )
                )
                / F.size("minhash_src"),
                F.lit(0.0),
            )
        else:
            est = F.lit(0.0)
        df = (
            df.withColumn("_inter", inter)
            .withColumn(
                "jaccard",
                F.when(
                    both,
                    F.when(union > 0, F.col("_inter") / union).otherwise(F.lit(0.0)),
                ).otherwise(est),
            )
            .withColumn(
                "containment",
                F.when(
                    both & (F.least(sa, sb) > 0), F.col("_inter") / F.least(sa, sb)
                ).otherwise(F.lit(0.0)),
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
        eq = F.size(
            F.filter(
                F.zip_with("minhash_src", "minhash_dst", lambda x, y: x == y),
                lambda v: v,
            )
        )
        df = df.withColumn("jaccard", eq / F.size("minhash_src")).withColumn(
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
