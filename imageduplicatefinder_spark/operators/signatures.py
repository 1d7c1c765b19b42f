"""Signature stage: documents -> per-row fingerprints.

Spark analog of ``idf hash ROOT --algo ... --out hashes.csv``
(ref: src/main/java/app/Commands.java:56-96): scan -> filter ->
fingerprint UDF -> checkpoint. The reference's single-threaded per-file
loop becomes one Arrow-batched projection; per-file error isolation
(ref: Commands.java:81-84) becomes null-tolerant fingerprinting plus an
error-count metric instead of stderr lines.

Output schema (FIXTURES.md §2 `signatures`):
    doc_id:long (xxhash64 of repo/path/commit — deterministic key),
    repo, path, commit, lang,
    sha256:string (hex — per-row invariant vs reference input),
    size:long, n_tokens:int,
    simhash:long, minhash:array<long>, shingles:array<long>
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from imageduplicatefinder_spark.config import DedupConfig
from imageduplicatefinder_spark.functions.fingerprints import make_fingerprint_udf


def add_doc_id(df: DataFrame) -> DataFrame:
    """Deterministic 64-bit key from the natural key (repo, path, commit).

    The reference keys rows by filesystem path string
    (ref: app/Commands.java:70); a fixed-width key shuffles cheaper and
    gives the min-label CC deterministic cluster ids.
    """
    return df.withColumn("doc_id", F.xxhash64("repo", "path", "commit"))


def compute_signatures(
    documents: DataFrame,
    cfg: DedupConfig,
    langs: list[str] | None = None,
    keep_shingles: bool = True,
) -> DataFrame:
    """documents(repo,path,commit,lang,content) -> signatures.

    ``langs`` is the pushed-down extension-filter analog
    (ref: app/Commands.java:74 `(?i).*\\.(jpg|jpeg|png|bmp)`).
    ``keep_shingles=False`` drops the shingle-set column for
    footprint-sensitive runs (verification then uses the MinHash
    Jaccard estimate instead of exact set intersection).
    """
    df = documents
    if langs:
        df = df.filter(F.col("lang").isin(langs))
    df = add_doc_id(df)

    # The fingerprint UDF is embarrassingly parallel and CPU-bound; a
    # narrow input (one parquet file -> one partition) would serialize
    # it on a single core. Widen only when the scan is narrower than
    # the cluster — at real scale the source already has thousands of
    # partitions and this is a no-op.
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        df = df.repartition(parallelism * 2, "doc_id")

    fp = make_fingerprint_udf(cfg)
    df = df.select(
        "doc_id",
        "repo",
        "path",
        "commit",
        "lang",
        F.sha2(F.col("content").cast("string"), 256).alias("sha256"),
        F.length("content").cast("long").alias("size"),
        fp(F.col("content")).alias("fp"),
    ).select(
        "doc_id",
        "repo",
        "path",
        "commit",
        "lang",
        "sha256",
        "size",
        F.col("fp.n_tokens").alias("n_tokens"),
        F.col("fp.simhash").alias("simhash"),
        F.col("fp.minhash").alias("minhash"),
        *(["fp.shingles"] if keep_shingles else []),
    )
    return df
