"""IVF ANN: recall vs the exact brute-force baseline on real testdata."""

import pytest
from pyspark.sql import functions as F

from imageduplicatefinder_spark.operators.similarity import (
    assign_lists,
    ivf_topk,
    train_centroids,
)
from imageduplicatefinder_spark.queries import QUERIES
from imageduplicatefinder_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


def test_assignment_covers_all_vectors(spark, emb):
    cents = train_centroids(emb, nlist=8)
    assert cents.shape == (8, 64)
    listed = assign_lists(emb, cents)
    assert listed.count() == emb.count()
    n_lists = listed.select("list_id").distinct().count()
    assert 2 <= n_lists <= 8


def test_ivf_topk_recall_vs_brute_force(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    ivf = ivf_topk(emb, queries, k=5, nlist=8, nprobe=3)
    got = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    exact = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["ann_cosine_topk"](spark, SF_DIR).collect()
    }
    recall = len(got & exact) / len(exact)
    # nprobe=3/8 lists: the true neighbors live near the query's
    # centroid, so recall should be high (not 1.0 — that's the tradeoff)
    assert recall >= 0.6, recall


def test_ivf_deterministic(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3)
    a = sorted(map(tuple, ivf_topk(emb, queries, k=3).collect()))
    b = sorted(map(tuple, ivf_topk(emb, queries, k=3).collect()))
    assert a == b


def test_blocked_cosine_pairs_matches_brute_force(spark, emb):
    """The distributed block-matrix form must be EXACT: same pair set
    and same cosine_milli as a naive all-pairs computation."""
    import numpy as np

    from imageduplicatefinder_spark.operators.similarity import blocked_cosine_pairs

    sub = emb.filter(F.col("vec_id") < 120)
    got = {
        (r.vec_a, r.vec_b): r.cosine_milli
        for r in blocked_cosine_pairs(sub, threshold=0.8, n_blocks=4).collect()
    }
    rows = sub.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    cos = (mat @ mat.T) / np.outer(norms, norms)
    want = {}
    n = len(ids)
    for i in range(n):
        for j in range(n):
            if ids[i] < ids[j] and cos[i, j] >= 0.8:
                a, b = int(ids[i]), int(ids[j])
                want[(a, b)] = int(np.floor(cos[i, j] * 1000))
    assert got == want


def test_blocked_cosine_pairs_no_cartesian_no_collect(spark, emb):
    from imageduplicatefinder_spark.operators.similarity import blocked_cosine_pairs

    plan = blocked_cosine_pairs(emb, threshold=0.95)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_blocked_cosine_zero_norm_excluded(spark):
    rows = [(1, [0.0] * 4), (2, [0.0] * 4), (3, [1.0, 0.0, 0.0, 0.0]),
            (4, [1.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from imageduplicatefinder_spark.operators.similarity import blocked_cosine_pairs

    got = {(r.vec_a, r.vec_b) for r in
           blocked_cosine_pairs(df, threshold=0.9, n_blocks=2).collect()}
    assert got == {(3, 4)}  # zero vectors never pair


def test_train_centroids_partitioning_invariant(spark, emb):
    """Cluster-safe sampling: the centroid sample must not depend on
    which partitions answer first (a bare limit().collect() does)."""
    a = train_centroids(emb.repartition(7), nlist=8)
    b = train_centroids(emb.repartition(3, "vec_id"), nlist=8)
    assert (a == b).all()


def test_ivf_small_table_clamps_nlist_and_nprobe(spark):
    """Fewer vectors than requested lists (and nprobe > nlist) must not
    crash — the quantizer clamps to the population."""
    rows = [(i, [float(i == j) for j in range(8)]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ivf_topk(df, df.filter(F.col("vec_id") < 2), k=3,
                   nlist=16, nprobe=32)
    assert out.count() >= 0  # executes without shape errors


def test_hyperplane_lsh_or_amplification_improves_recall(spark):
    """Planted near-dup pairs (cos >= 0.95): the multi-table union must
    (a) emit only true candidate pairs also found exactly, and
    (b) recall at 6 tables must beat a single table and reach >= 0.9."""
    import numpy as np

    from imageduplicatefinder_spark.operators.similarity import (
        blocked_cosine_pairs,
        hyperplane_lsh_pairs,
        hyperplane_tables,
    )

    rng = np.random.default_rng(5)
    dim = 64
    rows = []
    vid = 0
    truth = set()
    for _ in range(40):                     # 40 planted near-dup pairs
        v = rng.standard_normal(dim)
        w = v + 0.12 * rng.standard_normal(dim)   # cos ~ 0.97
        rows.append((vid, v.tolist()))
        rows.append((vid + 1, w.tolist()))
        truth.add((vid, vid + 1))
        vid += 2
    for _ in range(120):                    # background
        rows.append((vid, rng.standard_normal(dim).tolist()))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    exact = {
        (r.vec_a, r.vec_b)
        for r in blocked_cosine_pairs(df, threshold=0.95, n_blocks=4).collect()
    }
    assert truth <= exact                   # sanity: plants are real

    tables6 = hyperplane_tables(n_tables=6, bits=8, dim=dim, seed=11)
    cand6 = {(r.vec_a, r.vec_b)
             for r in hyperplane_lsh_pairs(df, tables6).collect()}
    cand1 = {(r.vec_a, r.vec_b)
             for r in hyperplane_lsh_pairs(df, tables6[:1]).collect()}
    recall6 = len(cand6 & truth) / len(truth)
    recall1 = len(cand1 & truth) / len(truth)
    assert recall6 >= recall1               # OR-amplification monotone
    assert recall6 >= 0.9, (recall1, recall6)
    assert cand1 <= cand6                   # table 1's pairs are a subset


def test_hyperplane_lsh_bucket_cap_bounds_degenerate_buckets(spark):
    """All-identical embeddings collapse into one bucket per table; the
    salted cap must bound the pair blowup instead of joining the full
    bucket against itself."""
    from imageduplicatefinder_spark.operators.similarity import (
        hyperplane_lsh_pairs,
        hyperplane_tables,
    )

    rows = [(i, [1.0] * 16) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    tables = hyperplane_tables(n_tables=2, bits=4, dim=16, seed=3)
    capped = hyperplane_lsh_pairs(df, tables, max_bucket_size=16).count()
    uncapped = hyperplane_lsh_pairs(df, tables, max_bucket_size=None).count()
    assert uncapped == 200 * 199 // 2       # one degenerate bucket
    assert 0 < capped < uncapped            # thinned, not silent-empty
    # the salted threshold keeps ~cap members per bucket IN EXPECTATION
    # (binomial, not exact), so bound loosely: well under 2x-cap pairs
    # per table, and orders of magnitude below the quadratic blowup
    assert capped <= 2 * (32 * 31 // 2), capped
    assert capped < uncapped // 10


def test_semdedup_keeper_matches_within_cell_brute_force(spark, emb):
    """SemDeDup keeper pinned against an in-process oracle: recompute
    the centroid assignment, within-cell cosine graph, and connected
    components in numpy and require IDENTICAL keeper decisions."""
    import numpy as np

    from imageduplicatefinder_spark.operators.similarity import (
        semantic_dedup_keeper,
        train_centroids,
    )

    # the driver testdata embeddings are near-orthogonal (max pairwise
    # cosine ~0.51), so plant REAL dup groups: 12 anchors, each with 3
    # jittered copies (cosine >> 0.95), plus the testdata as background
    rng = np.random.default_rng(7)
    planted = []
    vid = 100000
    for g in range(12):
        anchor = rng.standard_normal(64)
        for _ in range(4):
            v = anchor + rng.standard_normal(64) * 0.01
            planted.append((vid, [float(x) for x in v], g))
            vid += 1
    emb = emb.unionByName(
        emb.sparkSession.createDataFrame(
            planted, "vec_id long, embedding array<float>, label int"
        )
    )

    t_milli, nlist, seed = 950, 8, 42
    got = {r.vec_id: (r.list_id, r.action, r.keeper_id)
           for r in semantic_dedup_keeper(
               emb, threshold_milli=t_milli, nlist=nlist, seed=seed
           ).collect()}

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    cents = train_centroids(emb, nlist=nlist, seed=seed)
    d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    cell = d.argmin(axis=1)
    # union-find over within-cell pairs with cosine >= t
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    norms = np.sqrt((mat * mat).sum(axis=1))
    for c in range(nlist):
        idx = np.nonzero(cell == c)[0]
        if idx.size < 2:
            continue
        sub = mat[idx] / norms[idx][:, None]
        cos = sub @ sub.T
        for a in range(idx.size):
            for b in range(a + 1, idx.size):
                if cos[a, b] >= t_milli / 1000.0:
                    ra, rb = find(int(ids[idx[a]])), find(int(ids[idx[b]]))
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for i, c in zip(ids, cell):
        root = find(int(i))
        expected[int(i)] = (
            int(c),
            "KEEP" if root == int(i) else "DELETE",
            root,
        )
    assert got == expected
    # non-vacuous: the testdata embeddings contain planted near-dups
    assert any(v[1] == "DELETE" for v in got.values())
