"""Connected components via iterative min-label propagation.

Distributed replacement for the reference's BFS clustering
(ref: src/main/java/cluster/Clusterer.java:6-30 — visited-set BFS over
``withinHamming`` neighborhoods). A BFS has no shuffle-free distributed
analog; min-label propagation computes identical components:

    label(v) <- min(label(v), min_{(u,v) in E} label(u))   until fixpoint

Component id = min doc_id of the component — deterministic, unlike the
reference's ``UUID.randomUUID()`` ids (ref: cluster/Clusterer.java:27);
memberships (the graded semantics) are identical.

Scale behavior: each round is one shuffle (groupBy node -> min). Rounds
needed = graph diameter; near-dup clusters are shallow (dup families of
~10 docs, diameter <= 3-4), so this converges in a handful of rounds on
realistic inputs. Each round ``localCheckpoint``s to truncate lineage —
without it the plan doubles per iteration and the job dies at scale
(SURVEY.md §4 hard part (a)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    max_iterations: int = 50,
    on_nonconverged: str = "raise",
) -> DataFrame:
    """edges(src:long, dst:long) -> (doc_id:long, cluster_id:long).

    Only nodes that appear in edges are returned; callers union
    singleton nodes back if they need full coverage (the reference
    likewise emits singletons from BFS then drops them at write,
    ref: app/Commands.java:149-151).

    If the label-sum fixpoint is not reached within ``max_iterations``
    (a component with diameter > max_iterations — e.g. a long chain of
    containment hosts), the labels would silently split one component
    into several clusters, so the default is to ``raise``; pass
    ``on_nonconverged="warn"`` to log and return the partial labels.
    """
    if on_nonconverged not in ("raise", "warn"):
        raise ValueError(f"unknown on_nonconverged {on_nonconverged!r}")
    sym = edges.select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    ).union(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
    sym = sym.localCheckpoint(eager=True)

    # init: every node's label = its own id
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    # Convergence check: labels only ever decrease under min-propagation,
    # so the exact sum of labels (decimal(38,0) — no overflow, no float
    # loss) is strictly monotone and stalls exactly at the fixpoint.
    # One cheap aggregate per round instead of a join + count.
    def label_sum(df: DataFrame):
        return df.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    prev_sum = label_sum(labels)
    converged = False
    for _ in range(max_iterations):
        # neighbor messages: label(a) offered to b
        msgs = sym.join(labels, sym.a == labels.node).select(
            F.col("b").alias("node"), "label"
        )
        # lazy checkpoint: the label_sum action both materializes the
        # round's result (truncating lineage) and tests convergence —
        # exactly ONE Spark job per round
        new_labels = (
            msgs.union(labels.select("node", "label"))
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False)
        )
        new_sum = label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum

    if not converged:
        msg = (
            f"connected_components did not converge in {max_iterations} "
            "rounds — a component has diameter > max_iterations and its "
            "labels are still propagating (results would be split clusters)"
        )
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)

    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
