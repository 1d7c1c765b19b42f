"""Clusters table + keeper plan (KEEP / DELETE decisions).

Spark analog of ``idf plan`` (ref: src/main/java/app/Commands.java:186-237):
per-cluster comparator sort -> first member KEEP, rest DELETE. The
reference sorts by pixels DESC, size DESC, mtime ASC, path ASC
(case-insensitive) (ref: Commands.java:212-221); for text payloads
"pixels" maps to content size, so the tiebreak is
size DESC -> mtime ASC (when present) -> lower(path) ASC -> doc_id.
A textbook windowed top-1 — one shuffle on cluster_id.

The engine emits the *decision table*; it does not mutate a filesystem
(the reference's quarantine move, Commands.java:302-354, is a
side-effecting sink out of scope for a query engine — S9 in SURVEY §2.1
maps it to writing the DELETE partition of this table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def clusters_table(
    components: DataFrame, signatures: DataFrame, min_size: int = 2
) -> DataFrame:
    """(cluster_id, doc_id, repo, path, commit, size) — only clusters
    with >= min_size members, matching the reference's singleton drop
    (ref: app/Commands.java:149-151)."""
    joined = components.join(
        signatures.select("doc_id", "repo", "path", "commit", "size"), on="doc_id"
    )
    w = Window.partitionBy("cluster_id")
    return (
        joined.withColumn("_n", F.count("*").over(w))
        .filter(F.col("_n") >= min_size)
        .drop("_n")
    )


def keeper_plan(clusters: DataFrame) -> DataFrame:
    """clusters -> (cluster_id, action, repo, path, commit, reason).

    Keeper = row_number()==1 under the reference tiebreak order
    (ref: app/Commands.java:212-233). `mtime` participates when the
    input carries it; absent columns are skipped.
    """
    order = [F.desc("size")]
    if "mtime" in clusters.columns:
        order.append(F.asc("mtime"))
    order += [F.asc(F.lower("path")), F.asc("doc_id")]
    w = Window.partitionBy("cluster_id").orderBy(*order)
    return (
        clusters.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "action", F.when(F.col("_rn") == 1, F.lit("KEEP")).otherwise(F.lit("DELETE"))
        )
        .withColumn(
            "reason",
            F.when(F.col("_rn") == 1, F.lit("largest content, first path")).otherwise(
                F.lit("duplicate of keeper")
            ),
        )
        .select("cluster_id", "action", "repo", "path", "commit", "size", "reason")
    )


def apply_plan_overrides(plan: DataFrame, overrides: DataFrame) -> DataFrame:
    """Plan edit round-trip, the data path of the reference's
    interactive plan editor (ref: app/WebServer.java:332-394 — the UI
    POSTs per-row action toggles back before apply; SURVEY O4): join
    user overrides (repo, path, commit, action) onto the decision table
    and take the override where present.

    Safety rules enforced by the editor (and re-enforced here):
    - a cluster must keep at least one member — if overrides mark every
      member of a cluster DELETE, the reference tiebreak keeper of that
      cluster is flipped back to KEEP with reason 'override rejected:
      cluster needs a keeper';
    - overrides are sanitized before the join: rows whose action is not
      exactly KEEP/DELETE are ignored, and duplicate overrides for one
      file collapse deterministically with KEEP winning (never fan the
      plan row out or let a conflicting pair produce two decisions).
    """
    ov = (
        overrides.filter(F.col("action").isin("KEEP", "DELETE"))
        .groupBy("repo", "path", "commit")
        .agg(F.max("action").alias("_ov_action"))  # 'KEEP' > 'DELETE'
    )
    merged = plan.join(ov, on=["repo", "path", "commit"], how="left").withColumn(
        "action_eff", F.coalesce("_ov_action", "action")
    )
    w = Window.partitionBy("cluster_id")
    keeps = F.sum((F.col("action_eff") == "KEEP").cast("int")).over(w)
    # fallback keeper = the reference-tiebreak winner (original KEEP row)
    needs_fix = (keeps == 0) & (F.col("action") == "KEEP")
    return (
        merged.withColumn("_keeps", keeps)
        .select(
            "cluster_id",
            F.when(needs_fix, F.lit("KEEP"))
            .otherwise(F.col("action_eff"))
            .alias("action"),
            "repo",
            "path",
            "commit",
            "size",
            F.when(needs_fix, F.lit("override rejected: cluster needs a keeper"))
            .when(F.col("_ov_action").isNotNull(), F.lit("user override"))
            .otherwise(F.col("reason"))
            .alias("reason"),
        )
    )
