"""Approximate nearest-neighbor search over an embedding column.

Three tiers, matching how a 100 TB deployment would actually escalate:

1. ``brute_force_topk`` — exact cosine top-k via broadcast matmul
   (queries.py `ann_cosine_topk` is the oracle-checked form). Correct,
   O(N*Q); the baseline every approximate method is measured against.
2. ``ann_lsh_bucketed`` (queries.py) — random-hyperplane buckets;
   pairs only form within a bucket.
3. ``ivf_topk`` (here) — IVF: a coarse quantizer (deterministic
   centroid sample + one Lloyd refinement) partitions vectors into
   nlist inverted lists; each query probes its ``nprobe`` nearest
   lists and brute-forces only those. The Spark shape: centroids are
   a broadcast matrix (tiny), assignment is one mapInPandas matmul,
   the probe join is an equi-join on list id — no all-pairs shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str):
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, mat


def train_centroids(
    embeddings: DataFrame,
    nlist: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic coarse quantizer: seeded sample as initial
    centroids + one Lloyd step over a bounded sample (the quantizer
    trains on a sample even at 100 TB — standard IVF practice)."""
    sample = embeddings.select(vec_col).limit(4096).collect()
    mat = np.array([r[0] for r in sample], dtype=np.float64)
    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(mat.shape[0], size=nlist, replace=False)]
    # one Lloyd refinement
    d = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)
    for j in range(nlist):
        members = mat[assign == j]
        if members.shape[0]:
            centroids[j] = members.mean(axis=0)
    return centroids


def assign_lists(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, list_id, embedding): nearest-centroid assignment via one
    broadcast matmul per Arrow batch."""
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value
        c_sq = (cents * cents).sum(axis=1)
        for pdf in batches:
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; ||x||^2 constant per row
            scores = -2.0 * (mat @ cents.T) + c_sq[None, :]
            pdf = pdf[[id_col, vec_col]].copy()
            pdf["list_id"] = scores.argmin(axis=1).astype(np.int32)
            yield pdf

    schema = f"{id_col} long, {vec_col} array<float>, list_id int"
    return embeddings.select(id_col, vec_col).mapInPandas(run, schema)


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe the nprobe nearest inverted lists
    per query, brute-force cosine within them.

    Output: (query_id, rank, neighbor_id, cosine_milli).
    """
    centroids = train_centroids(embeddings, nlist=nlist, seed=seed,
                                vec_col=vec_col)
    listed = assign_lists(embeddings, centroids, id_col, vec_col)

    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def probes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value
        c_sq = (cents * cents).sum(axis=1)
        for pdf in batches:
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            scores = -2.0 * (mat @ cents.T) + c_sq[None, :]
            near = np.argsort(scores, axis=1)[:, :nprobe].astype(np.int32)
            out = pdf.loc[pdf.index.repeat(nprobe), [id_col, vec_col]].copy()
            out["list_id"] = near.ravel()
            yield out

    q_lists = queries.select(id_col, vec_col).mapInPandas(
        probes, f"{id_col} long, {vec_col} array<float>, list_id int"
    ).withColumnsRenamed({id_col: "query_id", vec_col: "qe"})

    cand = q_lists.join(
        listed.withColumnsRenamed({id_col: "neighbor_id", vec_col: "ne"}),
        on="list_id",
    ).filter(F.col("query_id") != F.col("neighbor_id"))

    dot = F.aggregate(
        F.zip_with("qe", "ne", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    nq = F.sqrt(F.aggregate(
        F.transform("qe", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    nn = F.sqrt(F.aggregate(
        F.transform("ne", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    ranked = (
        cand.withColumn("cos", F.try_divide(dot, nq * nn))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("cos"), F.asc("neighbor_id")
                )
            ),
        )
        .filter(F.col("rank") <= k)
    )
    return ranked.select(
        "query_id", "rank", "neighbor_id",
        F.floor(F.col("cos") * 1000).cast("long").alias("cosine_milli"),
    )
