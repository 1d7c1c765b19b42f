from imageduplicatefinder_spark.operators.signatures import compute_signatures
from imageduplicatefinder_spark.operators.exact import exact_dup_edges
from imageduplicatefinder_spark.operators.lsh import band_table, candidate_pairs
from imageduplicatefinder_spark.operators.verify import verify_pairs
from imageduplicatefinder_spark.operators.components import connected_components
from imageduplicatefinder_spark.operators.plan import clusters_table, keeper_plan

__all__ = [
    "compute_signatures",
    "exact_dup_edges",
    "band_table",
    "candidate_pairs",
    "verify_pairs",
    "connected_components",
    "clusters_table",
    "keeper_plan",
]
