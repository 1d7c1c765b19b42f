"""Clusters table + keeper plan (KEEP / DELETE decisions).

Spark analog of ``idf plan`` (ref: src/main/java/app/Commands.java:186-237):
per-cluster comparator sort -> first member KEEP, rest DELETE. The
reference sorts by pixels DESC, size DESC, mtime ASC, path ASC
(case-insensitive) (ref: Commands.java:212-221); for text payloads
"pixels" maps to content size, so the tiebreak is
size DESC -> mtime ASC (when present) -> lower(path) ASC -> doc_id.
Computed as a partial-aggregating min_by over an order-encoding struct
(NOT a row_number window — a window sorts every cluster member on one
task, which dies on viral mega-clusters at scale).

The engine emits the *decision table*; it does not mutate a filesystem
(the reference's quarantine move, Commands.java:302-354, is a
side-effecting sink out of scope for a query engine — S9 in SURVEY §2.1
maps it to writing the DELETE partition of this table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clusters_table(
    components: DataFrame, signatures: DataFrame, min_size: int = 2
) -> DataFrame:
    """(cluster_id, doc_id, repo, path, commit, size) — only clusters
    with >= min_size members, matching the reference's singleton drop
    (ref: app/Commands.java:149-151).

    Size check is a groupBy + join, NOT a count window: a window
    partition co-locates every member of a cluster on one task, and at
    10^12 files a viral blob (one file copied 10^8 times) is a single
    cluster — the aggregate gets map-side partial counts instead.
    """
    joined = components.join(
        signatures.select("doc_id", "repo", "path", "commit", "size"), on="doc_id"
    )
    # size gate counted AFTER the signatures join: members absent from
    # signatures (e.g. a lang-filtered table) must not keep a cluster
    # alive that emits fewer than min_size rows
    sizes = (
        joined.groupBy("cluster_id")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= min_size)
        .select("cluster_id")
    )
    return joined.join(sizes, on="cluster_id").select(
        "cluster_id", "doc_id", "repo", "path", "commit", "size"
    )


def _keeper_order(clusters: DataFrame):
    """Orderable struct encoding the reference tiebreak as a single
    ascending MIN: size DESC (negated) -> mtime ASC (when present) ->
    lower(path) ASC -> doc_id ASC (unique, so the order is total).

    NULL size loses (the old window's desc_nulls_last; the reference
    penalizes unreadables so they never win, Commands.java:207-209):
    the negation would otherwise put struct-NULL first and crown a
    corrupt member. mtime rides as the RAW timestamp (orderable in
    structs) — an epoch-seconds cast would truncate sub-second
    precision and flip keepers between same-second files."""
    fields = [(-F.coalesce(F.col("size"), F.lit(-(1 << 62)))).alias("_o_size")]
    if "mtime" in clusters.columns:
        fields.append(F.col("mtime").alias("_o_mtime"))
    fields += [F.lower("path").alias("_o_path"), F.col("doc_id").alias("_o_id")]
    return F.struct(*fields)


def keeper_plan(clusters: DataFrame) -> DataFrame:
    """clusters -> (cluster_id, action, repo, path, commit, reason).

    Keeper = MIN over the reference tiebreak order
    (ref: app/Commands.java:212-233), computed as a partial-aggregating
    ``min_by`` + join rather than a row_number window: a window sorts
    every cluster member on ONE task, which dies on a mega-cluster
    (viral exact-dup file at 10^12 scale); the aggregate combines
    map-side and the join back is AQE-skew-splittable. `mtime`
    participates when the input carries it.
    """
    keepers = clusters.groupBy("cluster_id").agg(
        F.min_by("doc_id", _keeper_order(clusters)).alias("_keeper_id")
    )
    is_keeper = F.col("doc_id") == F.col("_keeper_id")
    return (
        clusters.join(keepers, on="cluster_id")
        .withColumn(
            "action", F.when(is_keeper, F.lit("KEEP")).otherwise(F.lit("DELETE"))
        )
        .withColumn(
            "reason",
            F.when(is_keeper, F.lit("largest content, first path")).otherwise(
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
    # keeps-per-cluster via groupBy + join, not a count window — the
    # same mega-cluster single-task hazard keeper_plan avoids
    keeps_tbl = merged.groupBy("cluster_id").agg(
        F.sum((F.col("action_eff") == "KEEP").cast("int")).alias("_keeps")
    )
    merged = merged.join(keeps_tbl, on="cluster_id")
    # fallback keeper = the reference-tiebreak winner (original KEEP row)
    needs_fix = (F.col("_keeps") == 0) & (F.col("action") == "KEEP")
    return (
        merged
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
