"""End-to-end dedup pipeline: the Spark analog of the reference's
3-stage chained job hash -> cluster -> plan
(ref: src/main/java/app/WebServer.java:84-128, app/Commands.java wrappers
:393-431), with stage checkpoints replacing the CSV hand-offs.

    documents
      -> documents_hashed (JVM sha256, narrow; ckpt)      [ref: idf hash]
      -> exact-dup collapse: fingerprint ONLY distinct content —
         the reference hashes every file (Commands.java:72-84); at
         10^12-file scale exact copies dominate, so the expensive
         shingle/MinHash UDF runs on representatives only
      -> signatures (fingerprint UDF on reps; ckpt)
      -> LSH bands (JVM band hashing, salted hot-band cap; ckpt)
      -> candidates (band equi-join; ckpt)
      -> verified edges (Jaccard/containment/Hamming; ckpt)
      -> components (iterative min-label propagation)     [ref: idf cluster]
      -> clusters (>=2 members; ckpt)
      -> plan (min_by keeper, mega-cluster safe; ckpt)    [ref: idf plan]
"""

from __future__ import annotations

import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imageduplicatefinder_spark.config import DedupConfig
from imageduplicatefinder_spark.operators.components import connected_components
from imageduplicatefinder_spark.operators.exact import exact_dup_edges, rep_ids
from imageduplicatefinder_spark.operators.lsh import (
    band_table,
    capped_bands,
    pairs_from_capped_bands,
)
from imageduplicatefinder_spark.operators.plan import clusters_table, keeper_plan
from imageduplicatefinder_spark.operators.prefix_join import (
    exact_candidates,
    prefix_candidates,
)
from imageduplicatefinder_spark.operators.signatures import (
    add_doc_id,
    compute_signatures,
    hash_documents,
)
from imageduplicatefinder_spark.operators.verify import verify_pairs
from imageduplicatefinder_spark.plans.checkpoint import (
    CheckpointManager,
    input_signature,
)


@dataclass
class PipelineResult:
    documents_hashed: DataFrame  # per-row: doc_id, identity, sha256, size
    signatures: DataFrame        # fingerprints of distinct-content reps
    edges: DataFrame             # verified near-dup edges (src, dst, evidence)
    components: DataFrame        # (doc_id, cluster_id) for ALL rows
    clusters: DataFrame          # >=2-member clusters with identity columns
    plan: DataFrame              # KEEP/DELETE decisions
    ckpt: CheckpointManager


class DedupPipeline:
    def __init__(
        self,
        spark: SparkSession,
        cfg: DedupConfig | None = None,
        checkpoint_dir: str | None = None,
        durability: str = "disk",
    ) -> None:
        """``durability="memory"`` materializes stages via
        localCheckpoint instead of parquet — no resume, no disk floor;
        see plans/checkpoint.py. The default stays the durable,
        resumable disk mode the north_rule requires."""
        self.spark = spark
        self.cfg = cfg or DedupConfig()
        self.checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(prefix="idf_ckpt_")
        self.ckpt = CheckpointManager(spark, self.checkpoint_dir,
                                      self.cfg.config_hash(),
                                      durability=durability)

    def run(self, documents: DataFrame, langs: list[str] | None = None) -> PipelineResult:
        cfg = self.cfg
        # checkpoint reuse is keyed by (stage, config_hash, input identity):
        # same config over a different corpus must recompute, not replay
        self.ckpt.input_sig = input_signature(documents)

        docs_tbl = self.ckpt.materialize(
            "documents_hashed", lambda: hash_documents(documents, langs=langs)
        )

        # guard the 64-bit doc_id identity: xxhash64(repo,path,commit) is
        # an optimization-only shuffle key; the natural key rides along in
        # every table, but a silent collision would merge unrelated docs
        # into one CC node / cluster id. Birthday bound ~n^2/2^65 (~3e4
        # expected at 10^12 rows) — so the pipeline CHECKS instead of
        # assuming: one agg over the already-materialized hash table.
        # Compared against the DISTINCT natural-key count, not count(*):
        # the same file listed twice is a legitimate exact duplicate the
        # sha256 pre-pass absorbs, not a hash collision.
        # distinct keys counted over a STRUCT (never null even when a
        # key column is null — count_distinct over bare columns skips
        # null-containing rows and would false-alarm)
        idc = docs_tbl.agg(
            F.count_distinct(
                F.struct("repo", "path", "commit")
            ).alias("n_keys"),
            F.count_distinct("doc_id").alias("n_ids"),
        ).collect()[0]
        if idc["n_ids"] < idc["n_keys"]:
            raise RuntimeError(
                f"doc_id collision: {idc['n_keys'] - idc['n_ids']} duplicate "
                "64-bit ids for distinct (repo, path, commit) keys — "
                "rerun with a salted/widened id scheme"
            )

        # exact-dup star edges rep -> member (distance-0 classes,
        # ref: index/BKTreeIndex.java:27); groupBy-min + join, no window
        # (operators/exact.py is the single source of truth)
        reps_tbl = rep_ids(docs_tbl)
        ex_edges = exact_dup_edges(docs_tbl)

        # fingerprint ONLY distinct-content representatives
        def build_signatures() -> DataFrame:
            reps = reps_tbl.select(F.col("rep_id").alias("doc_id"))
            rep_docs = add_doc_id(
                documents if not langs
                else documents.filter(F.col("lang").isin(langs))
            ).join(reps, on="doc_id")
            # minhash is dropped from the checkpoint: band hashes are
            # precomputed in the UDF and verification is exact over the
            # shingle sets, so the 1 KB/row signature array would be
            # written and read for nothing (measured ~30% of the stage's
            # IO at scale)
            return compute_signatures(
                rep_docs.select("repo", "path", "commit", "lang", "content"), cfg
            ).drop("minhash")

        signatures = self.ckpt.materialize("signatures", build_signatures)

        if cfg.candidates == "lsh":
            # capped-band drop accounting is DURABLE: the hot-band stats
            # ride as their own (tiny) checkpoint so an operator
            # investigating missed duplicates can see which bands were
            # down-sampled
            _stats_holder: dict = {}

            def build_bands() -> DataFrame:
                kept, stats = capped_bands(band_table(signatures, cfg), cfg)
                _stats_holder["stats"] = stats
                return kept

            bands = self.ckpt.materialize("bands", build_bands)
            self.ckpt.materialize(
                "band_stats",
                lambda: (
                    _stats_holder["stats"]
                    if "stats" in _stats_holder
                    else capped_bands(band_table(signatures, cfg), cfg)[1]
                ).filter(F.col("capped")),
            )
            cands = self.ckpt.materialize(
                "candidates", lambda: pairs_from_capped_bands(bands)
            )
        elif cfg.candidates == "prefix":
            # AllPairs/PPJoin prefix filtering: EXACT for the verify
            # rule (no recall knob), deterministic — the high-threshold
            # default; no band stage, no drop accounting to record
            cands = self.ckpt.materialize(
                "candidates", lambda: prefix_candidates(signatures, cfg)
            )
        else:  # "exact": exhaustive inverted-index self-join
            cands = self.ckpt.materialize(
                "candidates", lambda: exact_candidates(signatures)
            )
        verified = self.ckpt.materialize(
            "edges",
            lambda: verify_pairs(cands, signatures, cfg).filter(F.col("verified")),
        )

        all_edges = verified.select("src", "dst").union(
            ex_edges.select("src", "dst")
        )

        # CC runs eagerly (per-round jobs), so it must live INSIDE the
        # materialize lambda: a resumed run reads the checkpoint back and
        # never re-iterates (previously the rounds re-ran and a
        # non-converging graph could abort a fully-checkpointed resume)
        def build_components() -> DataFrame:
            if cfg.cc_algorithm == "star":
                from imageduplicatefinder_spark.operators.components import (
                    connected_components_star,
                )

                comps = connected_components_star(all_edges)
            else:
                comps = connected_components(all_edges)
            # nodes never seen in any edge stay singletons (dropped from
            # the clusters table anyway, ref: app/Commands.java:149-151)
            return (
                docs_tbl.select("doc_id")
                .join(comps, on="doc_id", how="left")
                .select(
                    "doc_id",
                    F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
                )
            )

        comps_full = self.ckpt.materialize("components", build_components)
        clusters = self.ckpt.materialize(
            "clusters", lambda: clusters_table(comps_full, docs_tbl)
        )
        plan = self.ckpt.materialize("plan", lambda: keeper_plan(clusters))
        self.ckpt.flush_metrics()
        return PipelineResult(docs_tbl, signatures, verified, comps_full,
                              clusters, plan, self.ckpt)
