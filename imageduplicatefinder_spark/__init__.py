"""imageduplicatefinder_spark — a from-scratch PySpark-native near-duplicate
detection and clustering engine.

Generalizes the query/data semantics of the reference Java pipeline
(Besnn/ImageDuplicateFinder: perceptual-hash -> BK-tree radius search ->
BFS clustering -> keeper plan; see SURVEY.md) to content fingerprinting
over an Iceberg-shaped source-code table at large scale, expressed as
idiomatic Spark DataFrame plans:

    read(documents)
      -> sha256 exact-dup pre-pass          (ref: BKTreeIndex.java:27 distance-0 merge)
      -> k-shingle MinHash + 64-bit SimHash (ref: hash/{AHash,DHash,PHashDct}.java)
      -> LSH band equi-join candidate pairs (ref: index/BKTreeIndex.java:34-50)
      -> Hamming/Jaccard verification       (ref: hash/Hamming.java:4-6)
      -> connected components (min-label)   (ref: cluster/Clusterer.java:6-30)
      -> windowed keeper plan               (ref: app/Commands.java:200-237)

All hot-path compute is either JVM-side pyspark.sql.functions or
Arrow-vectorized pandas UDFs; no per-row Python anywhere.
"""

from imageduplicatefinder_spark.config import DedupConfig
from imageduplicatefinder_spark.session import get_spark

__all__ = ["DedupConfig", "get_spark"]
__version__ = "0.1.0"
