"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship near-dup clustering pipeline on
sf0.001; ``queries()``/``oracle_sql()`` expose the full catalog from
``imageduplicatefinder_spark.queries`` (one entry per implemented
operator family from SURVEY.md §2 plus the training-pipeline ops).
The four queries without an oracle entry are genuinely
non-SQL-expressible — they depend on the engine's internal vectorized
token hash (MinHash banding, the flagship LSH pipeline, the
gradient-sign sketch) or the stubbed media decode (pHash pairs) — and
get the driver's rows-only check. Every other registered
query is value-hash checked against DuckDB, including the
SimHash Hamming pairs (portable md5-nibble simhash), connected
components (recursive-CTE fixpoint), the hyperplane-bucketed ANN
(plane constants inlined as SQL literals), and — since round 5 — the
IVF top-k and SemDeDup keeper (pinned coarse-quantizer centroids
inlined the same way; the runtime-trained quantizer path stays
pytest-pinned in operators/similarity.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from imageduplicatefinder_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full near-duplicate
    detection pipeline (sha256 exact pre-pass -> MinHash/SimHash ->
    LSH banding -> Jaccard/containment verify -> connected components)
    over the documents table."""
    return QUERIES["near_dup_clusters"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
