"""Keeper-plan goldens with engineered tiebreaks
(ref: src/test/java/app/CommandsTest.java:156-193)."""

import datetime

from imageduplicatefinder_spark.operators.plan import clusters_table, keeper_plan


def test_keeper_tiebreak_size_then_path(spark):
    rows = [
        (100, 1, "r", "b.py", "c1", 50),
        (100, 2, "r", "a.py", "c2", 90),   # biggest -> KEEP
        (100, 3, "r", "c.py", "c3", 90),   # same size, later path -> DELETE
        (200, 4, "r", "x.py", "c4", 10),
        (200, 5, "r", "y.py", "c5", 10),   # tie -> path asc keeps x.py
    ]
    clusters = spark.createDataFrame(
        rows, "cluster_id long, doc_id long, repo string, path string, "
              "commit string, size long"
    )
    plan = keeper_plan(clusters)
    keep = {r.cluster_id: r.path for r in plan.filter("action='KEEP'").collect()}
    assert keep == {100: "a.py", 200: "x.py"}
    assert plan.filter("action='DELETE'").count() == 3


def test_keeper_respects_mtime_older_first(spark):
    # reference orders mtime ASC after size DESC (Commands.java:212-221)
    t1 = datetime.datetime(2020, 1, 1)
    t2 = datetime.datetime(2023, 1, 1)
    rows = [
        (1, 10, "r", "new.py", "c", 40, t2),
        (1, 11, "r", "old.py", "c", 40, t1),
    ]
    clusters = spark.createDataFrame(
        rows, "cluster_id long, doc_id long, repo string, path string, "
              "commit string, size long, mtime timestamp"
    )
    keep = keeper_plan(clusters).filter("action='KEEP'").collect()
    assert [r.path for r in keep] == ["old.py"]


def test_clusters_table_drops_singletons(spark):
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3)], "doc_id long, cluster_id long"
    )
    sigs = spark.createDataFrame(
        [(i, "r", f"p{i}", "c", 10) for i in (1, 2, 3)],
        "doc_id long, repo string, path string, commit string, size long",
    )
    out = clusters_table(comps, sigs)
    assert {r.doc_id for r in out.collect()} == {1, 2}  # singleton 3 dropped


def test_apply_plan_overrides_roundtrip(spark):
    """O4 plan edit round-trip (ref: app/WebServer.java:332-394): user
    overrides replace actions; a cluster left with zero keepers gets
    its tiebreak keeper flipped back."""
    from imageduplicatefinder_spark.operators.plan import apply_plan_overrides

    rows = [
        (100, 1, "r", "b.py", "c1", 50),
        (100, 2, "r", "a.py", "c2", 90),
        (200, 4, "r", "x.py", "c4", 10),
        (200, 5, "r", "y.py", "c5", 10),
    ]
    clusters = spark.createDataFrame(
        rows, "cluster_id long, doc_id long, repo string, path string, "
              "commit string, size long"
    )
    plan = keeper_plan(clusters)
    overrides = spark.createDataFrame(
        [
            ("r", "b.py", "c1", "KEEP"),    # keep BOTH members of 100
            ("r", "x.py", "c4", "DELETE"),  # would leave 200 keeper-less
        ],
        "repo string, path string, commit string, action string",
    )
    out = {r.path: r for r in apply_plan_overrides(plan, overrides).collect()}
    assert out["b.py"].action == "KEEP" and out["b.py"].reason == "user override"
    assert out["a.py"].action == "KEEP"              # untouched original keeper
    # cluster 200: override deleted the keeper; safety rule restores it
    assert out["x.py"].action == "KEEP"
    assert "cluster needs a keeper" in out["x.py"].reason
    assert out["y.py"].action == "DELETE"


def test_apply_plan_overrides_noop_without_overrides(spark):
    from imageduplicatefinder_spark.operators.plan import apply_plan_overrides

    clusters = spark.createDataFrame(
        [(1, 1, "r", "a.py", "c", 5), (1, 2, "r", "b.py", "c", 4)],
        "cluster_id long, doc_id long, repo string, path string, "
        "commit string, size long",
    )
    plan = keeper_plan(clusters)
    empty = spark.createDataFrame(
        [], "repo string, path string, commit string, action string"
    )
    got = sorted(map(tuple, apply_plan_overrides(plan, empty).collect()))
    want = sorted(map(tuple, plan.collect()))
    assert got == want


def test_keeper_null_size_never_wins(spark):
    """A corrupt member (NULL size) must lose keeper selection — the
    reference penalizes unreadables so they never win
    (Commands.java:207-209)."""
    clusters = spark.createDataFrame(
        [(1, 1, "r", "real.py", "c", 100), (1, 2, "r", "corrupt.py", "c", None)],
        "cluster_id long, doc_id long, repo string, path string, "
        "commit string, size long",
    )
    keep = keeper_plan(clusters).filter("action='KEEP'").collect()
    assert [r.path for r in keep] == ["real.py"]


def test_keeper_subsecond_mtime_precision(spark):
    """mtime tiebreak keeps full timestamp precision: same-second files
    with different sub-second mtimes keep the OLDER one."""
    t_older = datetime.datetime(2020, 1, 1, 0, 0, 0, 100000)
    t_newer = datetime.datetime(2020, 1, 1, 0, 0, 0, 900000)
    clusters = spark.createDataFrame(
        [(1, 1, "r", "a_newer.py", "c", 40, t_newer),
         (1, 2, "r", "b_older.py", "c", 40, t_older)],
        "cluster_id long, doc_id long, repo string, path string, "
        "commit string, size long, mtime timestamp",
    )
    keep = keeper_plan(clusters).filter("action='KEEP'").collect()
    assert [r.path for r in keep] == ["b_older.py"]


def test_clusters_table_gate_counts_after_signature_join(spark):
    """A cluster whose members are partly absent from signatures (e.g.
    a lang-filtered table) must not emit a sub-min_size 'cluster'."""
    comps = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 9), (4, 9)], "doc_id long, cluster_id long"
    )
    sigs = spark.createDataFrame(
        [(1, "r", "p1", "c", 10), (3, "r", "p3", "c", 10), (4, "r", "p4", "c", 10)],
        "doc_id long, repo string, path string, commit string, size long",
    )
    out = clusters_table(comps, sigs)
    assert {r.cluster_id for r in out.collect()} == {9}  # cluster 7 -> 1 row only
