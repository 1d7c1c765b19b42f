"""End-to-end dedup pipeline: the Spark analog of the reference's
3-stage chained job hash -> cluster -> plan
(ref: src/main/java/app/WebServer.java:84-128, app/Commands.java wrappers
:393-431), with stage checkpoints replacing the CSV hand-offs.

    documents
      -> signatures   (fingerprint UDF; ckpt)            [ref: idf hash]
      -> exact edges  (sha256 groupBy star edges)
      -> LSH bands    (JVM-side band hashing on distinct-content reps)
      -> candidates   (band equi-join, hot-band cap; ckpt)
      -> verified edges (hamming/jaccard/containment; ckpt)
      -> components   (iterative min-label propagation)   [ref: idf cluster]
      -> clusters     (>=2 members; ckpt)
      -> plan         (windowed keeper; ckpt)             [ref: idf plan]
"""

from __future__ import annotations

import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imageduplicatefinder_spark.config import DedupConfig
from imageduplicatefinder_spark.operators.components import connected_components
from imageduplicatefinder_spark.operators.exact import exact_dup_edges, representatives
from imageduplicatefinder_spark.operators.lsh import (
    band_table,
    capped_bands,
    pairs_from_capped_bands,
)
from imageduplicatefinder_spark.operators.plan import clusters_table, keeper_plan
from imageduplicatefinder_spark.operators.signatures import compute_signatures
from imageduplicatefinder_spark.operators.verify import verify_pairs
from imageduplicatefinder_spark.plans.checkpoint import CheckpointManager


@dataclass
class PipelineResult:
    signatures: DataFrame
    edges: DataFrame       # verified near-dup edges (src, dst, evidence)
    components: DataFrame  # (doc_id, cluster_id) incl. exact-dup members
    clusters: DataFrame    # >=2-member clusters with identity columns
    plan: DataFrame        # KEEP/DELETE decisions
    ckpt: CheckpointManager


class DedupPipeline:
    def __init__(
        self,
        spark: SparkSession,
        cfg: DedupConfig | None = None,
        checkpoint_dir: str | None = None,
    ) -> None:
        self.spark = spark
        self.cfg = cfg or DedupConfig()
        self.checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(prefix="idf_ckpt_")
        self.ckpt = CheckpointManager(spark, self.checkpoint_dir,
                                      self.cfg.config_hash())

    def run(self, documents: DataFrame, langs: list[str] | None = None) -> PipelineResult:
        cfg = self.cfg
        signatures = self.ckpt.materialize(
            "signatures", lambda: compute_signatures(documents, cfg, langs=langs)
        )

        ex_edges = exact_dup_edges(signatures)
        # distinct-content representatives feed LSH and verification;
        # cached because both the band build and the two-sided evidence
        # join re-scan them (cheap: narrow columns + signature arrays)
        reps = representatives(signatures).cache()
        bands = self.ckpt.materialize(
            "bands",
            lambda: capped_bands(band_table(reps, cfg), cfg)[0],
        )
        cands = self.ckpt.materialize(
            "candidates", lambda: pairs_from_capped_bands(bands)
        )
        verified = self.ckpt.materialize(
            "edges",
            lambda: verify_pairs(cands, reps, cfg).filter(F.col("verified")),
        )

        all_edges = verified.select("src", "dst").union(
            ex_edges.select("src", "dst")
        )
        comps = connected_components(all_edges)
        # nodes never seen in any edge stay singletons (dropped from the
        # clusters table anyway, ref: app/Commands.java:149-151)
        comps_full = self.ckpt.materialize(
            "components",
            lambda: signatures.select("doc_id")
            .join(comps, on="doc_id", how="left")
            .select(
                "doc_id",
                F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
            ),
        )
        clusters = self.ckpt.materialize(
            "clusters", lambda: clusters_table(comps_full, signatures)
        )
        plan = self.ckpt.materialize("plan", lambda: keeper_plan(clusters))
        reps.unpersist()
        return PipelineResult(signatures, verified, comps_full, clusters, plan,
                              self.ckpt)
