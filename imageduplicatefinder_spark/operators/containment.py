"""Exact containment verification for candidate pairs.

The shingle-set containment score (operators/verify.py) is the cheap
filter; this operator is the exact confirmation pass: for a candidate
pair, is the smaller document literally embedded in the larger one
(optionally after whitespace canonicalization)? This is the
suffix-matching stage of SURVEY §2.4 J3 / north_star "suffix-array
substring matching for containment duplicates".

Implementation note: each pair is checked once, so the optimal
primitive is a single substring scan (CPython's find() is a tuned
two-way/Crochemore-Perrin search — building a suffix array per pair
would cost O(n log n) to answer one O(n+m) question). A suffix
structure would only pay off for many probes against one host; the
grouped form below (`containment_verify_grouped`) amortizes repeated
hosts by grouping candidate pairs per host document.

Runs as applyInPandas over pairs joined with content — Arrow batches
in, one boolean + offset out.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONTAINMENT_SCHEMA = (
    "src long, dst long, contained boolean, contained_canonical boolean, "
    "offset long"
)


import re

# the EXPLICIT ASCII whitespace class — not str.split() (which collapses
# every Unicode space and \v) and not regex \s (whose membership differs
# between Python re and RE2): this exact set is what the DuckDB oracle's
# regexp_replace uses, so canonical-containment decisions are
# bit-identical cross-engine (queries.py SQL_CONTAINMENT_CONFIRMED)
_WS_RUN = re.compile(r"[ \t\n\f\r]+")


def _canon(s: str) -> str:
    return _WS_RUN.sub(" ", s).strip(" ")


def containment_verify(pairs: DataFrame, documents: DataFrame) -> DataFrame:
    """pairs(src, dst) x documents(doc_id, content) -> exact containment.

    Output: (src, dst, contained, contained_canonical, offset) where
    ``contained`` means the smaller content occurs verbatim inside the
    larger, ``offset`` its first position (-1 if absent), and
    ``contained_canonical`` the same after whitespace collapse.
    """
    c = documents.select("doc_id", "content")
    joined = (
        pairs.join(c.select(F.col("doc_id").alias("src"),
                            F.col("content").alias("content_src")), on="src")
        .join(c.select(F.col("doc_id").alias("dst"),
                       F.col("content").alias("content_dst")), on="dst")
    )

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"src": [], "dst": [], "contained": [],
                   "contained_canonical": [], "offset": []}
            for src, dst, ca, cb in zip(
                pdf["src"], pdf["dst"], pdf["content_src"], pdf["content_dst"]
            ):
                # NULL content = empty (the oracle coalesces identically;
                # a None would otherwise abort the whole task)
                ca = ca or ""
                cb = cb or ""
                small, big = (ca, cb) if len(ca) <= len(cb) else (cb, ca)
                off = big.find(small) if small else 0
                canon_hit = off >= 0 or _canon(small) in _canon(big)
                out["src"].append(src)
                out["dst"].append(dst)
                out["contained"].append(off >= 0)
                out["contained_canonical"].append(canon_hit)
                out["offset"].append(off)
            yield pd.DataFrame(out)

    return joined.mapInPandas(check, CONTAINMENT_SCHEMA)


def containment_verify_grouped(pairs: DataFrame, documents: DataFrame) -> DataFrame:
    """Grouped form: candidate pairs grouped per larger-side document
    (the HOST — not per dst, which is merely the greater doc_id) so one
    host's content is deserialized and canonicalized once per group
    instead of once per pair (matters when a popular host — a vendored
    library, a big generated file — attracts thousands of candidates,
    regardless of whether its doc_id sorts first or last in the pair).

    Same output schema as containment_verify.
    """
    c = documents.select("doc_id", "content")
    joined = (
        pairs.join(c.select(F.col("doc_id").alias("src"),
                            F.col("content").alias("content_src")), on="src")
        .join(c.select(F.col("doc_id").alias("dst"),
                       F.col("content").alias("content_dst")), on="dst")
        .withColumn(
            "host_id",
            # null-safe lengths: NULL content counts as empty, else the
            # NULL comparison would mis-crown the null doc as host
            F.when(
                F.coalesce(F.length("content_dst"), F.lit(0))
                >= F.coalesce(F.length("content_src"), F.lit(0)),
                F.col("dst"),
            ).otherwise(F.col("src")),
        )
    )

    def check_group(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {"src": [], "dst": [], "contained": [],
               "contained_canonical": [], "offset": []}
        # all rows share host_id: canonicalize the host lazily, once
        first = pdf.iloc[0]
        host = (first["content_dst"] if first["dst"] == first["host_id"]
                else first["content_src"]) or ""
        host_canon = None
        for src, dst, ca, cb in zip(
            pdf["src"], pdf["dst"], pdf["content_src"], pdf["content_dst"]
        ):
            small = (ca if dst == first["host_id"] else cb) or ""
            off = host.find(small) if small else 0
            canon_hit = off >= 0
            if not canon_hit:
                if host_canon is None:
                    host_canon = _canon(host)
                canon_hit = _canon(small) in host_canon
            out["src"].append(src)
            out["dst"].append(dst)
            out["contained"].append(off >= 0)
            out["contained_canonical"].append(canon_hit)
            out["offset"].append(off)
        return pd.DataFrame(out)

    return (
        joined.groupBy("host_id")
        .applyInPandas(check_group, CONTAINMENT_SCHEMA)
    )


def containment_candidates(
    signatures: DataFrame,
    min_ratio: float = 1.5,
    k_probe: int = 16,
    df_cap: int = 1024,
    return_stats: bool = False,
):
    """Asymmetric-length candidate pre-filter for the "small doc
    embedded in a big host" shape, with QUANTIFIABLE recall.

    MinHash band collisions are the wrong tool here: a snippet fully
    contained in a host 10x its size has Jaccard ~0.1, and 2-row band
    collision probability collapses with J — exactly the pairs this
    operator exists to surface would be missed. Instead: min-wise
    shingle probing. Each doc's ``shingles`` array is stored sorted, so
    its first ``k_probe`` entries are a uniform sample of its shingle
    set; if A is contained in B at containment c, each probe shingle of
    A is in B's set with probability ~c, so
    P(pair missed) <= (1 - c)^k_probe (~3% at c=0.8, k=16; ~1e-7 at
    c=0.9... the verify stage then confirms exactly).

    Scale shape: probe side is k_probe rows/doc (linear); build side is
    every shingle occurrence, with hot boilerplate shingles (document
    frequency > ``df_cap``) DOWN-SAMPLED to ~df_cap surviving
    occurrences via the same deterministic salted threshold as the LSH
    band cap (operators/lsh.py capped_bands) — bounded per-key join
    fan-out without dropping a hot shingle entirely; pass
    ``return_stats=True`` to also get the (shingle, df) table of capped
    shingles so the recall loss is visible, not silent. The equi-join
    on the shingle hash replaces the old all-pairs size crossJoin.
    ``signatures`` needs (doc_id, size, shingles); the narrow
    projection is lazily materialized once so the (possibly expensive,
    UDF-produced) signature lineage is not recomputed per consumer.
    """
    sig_narrow = signatures.select("doc_id", "size", "shingles") \
        .localCheckpoint(eager=False)
    occ = sig_narrow.select(
        "doc_id", F.explode("shingles").alias("shingle")
    ).localCheckpoint(eager=False)
    hot = (
        occ.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > df_cap)
    )
    salted = occ.join(F.broadcast(hot), on="shingle", how="left")
    build = salted.filter(
        F.col("df").isNull()
        | (F.pmod(F.xxhash64("doc_id", "shingle"), F.col("df")) < F.lit(df_cap))
    ).select("doc_id", "shingle")
    probes = sig_narrow.select(
        F.col("doc_id").alias("probe_id"),
        F.explode(F.slice("shingles", 1, k_probe)).alias("shingle"),
    )
    pairs = (
        probes.join(build, on="shingle")
        .filter(F.col("probe_id") != F.col("doc_id"))
        .select(
            F.least("probe_id", "doc_id").alias("src"),
            F.greatest("probe_id", "doc_id").alias("dst"),
        )
        .distinct()
    )
    sizes = sig_narrow.select("doc_id", "size")
    withs = (
        pairs.join(sizes.select(F.col("doc_id").alias("src"),
                                F.col("size").alias("size_src")), on="src")
        .join(sizes.select(F.col("doc_id").alias("dst"),
                           F.col("size").alias("size_dst")), on="dst")
    )
    big = F.greatest("size_src", "size_dst").cast("double")
    small = F.least("size_src", "size_dst").cast("double")
    out = (
        withs.withColumn("size_ratio", F.try_divide(big, small))
        .filter(F.col("size_ratio") >= min_ratio)
        .select("src", "dst")
    )
    if return_stats:
        return out, hot
    return out
