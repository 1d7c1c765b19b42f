"""Pigeonhole bit-chunk Hamming LSH: exhaustiveness vs brute force
(the distributed form of the reference's BK-tree radius query,
ref: src/main/java/index/BKTreeIndex.java:34-50)."""

import random

import pytest
from pyspark.sql import functions as F

from imageduplicatefinder_spark.functions.fingerprints import hamming_distance_col
from imageduplicatefinder_spark.operators.hamming_lsh import (
    _auto_n_agree,
    _chunk_widths,
    capped_sketch_keys,
    hamming_edges,
    hamming_pairs,
    sketch_keys,
)


def _brute(spark, df, radius):
    a = df.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = df.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    return {
        (r.doc_a, r.doc_b, r.hamming)
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "hamming", hamming_distance_col(F.col("sa"), F.col("sb")).cast("long")
        )
        .filter(F.col("hamming") <= radius)
        .collect()
    }


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


@pytest.fixture(scope="module")
def sketches(spark):
    """Random sketches plus planted near-misses: clones of a base with
    exactly r bits flipped for r in 0..12 (covers <=, ==, > radius)."""
    rng = random.Random(1234)
    rows = [(i, _to_signed(rng.getrandbits(64))) for i in range(120)]
    base = rng.getrandbits(64)
    nid = 1000
    for r in range(13):
        flipped = base
        for pos in rng.sample(range(64), r):
            flipped ^= 1 << pos
        rows.append((nid, _to_signed(flipped)))
        nid += 1
    # exact sketch duplicates (the same-sketch fast path)
    rows.append((2000, _to_signed(base)))
    rows.append((2001, _to_signed(base)))
    return spark.createDataFrame(rows, "doc_id long, simhash long")


def test_chunk_widths_cover_64_bits():
    for radius in (0, 1, 3, 10, 31):
        w = _chunk_widths(64, radius + 1)
        assert sum(w) == 64 and len(w) == radius + 1
        assert max(w) - min(w) <= 1


@pytest.mark.parametrize("radius", [0, 3, 10])
def test_hamming_pairs_equals_brute_force(spark, sketches, radius):
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in hamming_pairs(sketches, radius=radius).collect()
    }
    assert got == _brute(spark, sketches, radius)


@pytest.mark.parametrize("radius,n_agree", [(10, 1), (10, 2), (10, 3), (3, 2)])
def test_multi_block_keys_stay_exhaustive(spark, sketches, radius, n_agree):
    """Manku-style C(radius+m, m) combination keys find exactly the
    brute-force pair set for every m (the pigeonhole guarantee)."""
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in hamming_pairs(sketches, radius=radius,
                               n_agree=n_agree).collect()
    }
    assert got == _brute(spark, sketches, radius)


def test_auto_n_agree_policy():
    # single chunks stay selective (>=10 bits) up to radius 5
    assert all(_auto_n_agree(r) == 1 for r in range(6))
    # with no corpus-size signal (or a big one), wide radii get m=2
    assert all(_auto_n_agree(r) == 2 for r in (6, 10, 31))
    assert _auto_n_agree(10, n_sketches=1_000_000) == 2
    # small clustered corpora stay on m=1: close-pair key duplication
    # (~50 combos/pair) outweighs the S^2 collision savings below
    # AUTO_M2_MIN_SKETCHES (measured 2.6x at sf0.1, BENCH.md round 3)
    assert _auto_n_agree(10, n_sketches=5_000) == 1


def test_multi_block_keys_are_more_selective(spark, sketches):
    """The point of m=2 at radius 10: far more distinct join-key values
    than the <=64-per-chunk single-chunk scheme."""
    k1 = sketch_keys(sketches, 10, n_agree=1, sketch_col="simhash")
    k2 = sketch_keys(sketches, 10, n_agree=2, sketch_col="simhash")
    # values per key position: m=1 chunks hold <= 64 distinct values
    v1 = k1.groupBy("key_id").agg(
        F.count_distinct("key_val").alias("v")).agg(F.max("v")).collect()[0][0]
    assert v1 <= 64
    # m=2 packed keys are 10-12 bits -> far beyond 64 possible values;
    # on this corpus nearly every sketch gets a unique value per combo
    n_sketches = sketches.select("simhash").distinct().count()
    v2 = k2.groupBy("key_id").agg(
        F.count_distinct("key_val").alias("v")).agg(F.min("v")).collect()[0][0]
    assert v2 > 64 or v2 >= n_sketches * 0.9


def test_capped_sketch_keys_accounting(spark):
    """A mega-key gets down-sampled to ~cap with capped=true stats;
    small keys pass through untouched."""
    # 200 sketches that all share block pattern 0 in the low bits would
    # be contrived; instead cap aggressively so every key is hot
    rows = [(i, i << 40) for i in range(50)]  # low 40 bits identical (0)
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    keys = sketch_keys(df, 10, n_agree=2, sketch_col="simhash")
    kept, stats = capped_sketch_keys(keys, max_key_group=5)
    hot = stats.filter(F.col("capped")).count()
    assert hot > 0  # low-bit block combos are shared by all 50 sketches
    # kept size per hot key is ~cap (salted threshold keeps ~cap rows)
    per_key = (
        kept.groupBy("key_id", "key_val").count()
        .agg(F.max("count")).collect()[0][0]
    )
    assert per_key <= 15  # ~5 expected, deterministic hash variance bound
    # determinism: same input -> same kept set
    kept2, _ = capped_sketch_keys(keys, max_key_group=5)
    assert sorted(map(tuple, kept.collect())) == sorted(
        map(tuple, kept2.collect()))


def test_hamming_edges_cluster_parity(spark, sketches):
    """Star-edge emission yields the SAME connected components as the
    all-pairs form, with linear (not quadratic) same-sketch output."""
    from imageduplicatefinder_spark.operators.components import (
        connected_components,
    )

    pairs = hamming_pairs(sketches, radius=10).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = hamming_edges(sketches, radius=10)

    def comps(e):
        rows = connected_components(e).collect()
        by_cluster = {}
        for r in rows:
            by_cluster.setdefault(r.cluster_id, set()).add(r.doc_id)
        return {frozenset(v) for v in by_cluster.values()}

    assert comps(pairs) == comps(edges)
    # the 3-doc same-sketch family (base + 2000 + 2001) emits 3 pairs
    # in the all-pairs form but only 2 star edges here
    n_same_pairs = pairs.join(
        edges, on=["src", "dst"], how="left_anti").count()
    assert edges.count() < pairs.count() or n_same_pairs == 0


@pytest.mark.parametrize("n_agree", [1, 2])
def test_hamming_pairs_plan_has_no_cartesian(spark, sketches, n_agree):
    plan = (
        hamming_pairs(sketches, radius=10, n_agree=n_agree)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hamming_auto_cap_inert_below_threshold(spark, sketches):
    """The "auto" default must resolve to NO cap below
    AUTO_CAP_MIN_SKETCHES — byte-identical to explicit exact mode (the
    driver-scale hash-matches depend on this)."""
    import warnings as _warnings
    from imageduplicatefinder_spark.operators import hamming_lsh as H

    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        auto_df = hamming_pairs(sketches, radius=10)
    assert not [
        w for w in caught if issubclass(w.category, H.HammingAutoCapWarning)
    ], "no-cap resolution must stay silent"
    auto = {tuple(r) for r in auto_df.collect()}
    exact = {
        tuple(r)
        for r in hamming_pairs(
            sketches, radius=10, max_key_group=None
        ).collect()
    }
    assert auto == exact


def test_hamming_auto_cap_engages_at_scale(spark, sketches):
    """Past the (monkeypatched) threshold at radius >= 6 the auto
    policy must cap hot keys: the capped result is a SUBSET of exact,
    every surviving pair is within radius, and hamming_key_stats
    reports the truncated keys under the same policy."""
    from imageduplicatefinder_spark.operators import hamming_lsh as H

    old_cap_min, old_cap, old_m2 = (
        H.AUTO_CAP_MIN_SKETCHES, H.AUTO_MAX_KEY_GROUP, H.AUTO_M2_MIN_SKETCHES
    )
    # tiny thresholds so the 135-sketch fixture counts as "at scale";
    # cap 2 guarantees truncation inside the 13-member planted family
    H.AUTO_CAP_MIN_SKETCHES = 10
    H.AUTO_MAX_KEY_GROUP = 2
    try:
        import warnings as _warnings

        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            capped_df = hamming_pairs(sketches, radius=10)
        # the exact->approximate flip must be loud on the driver
        # (ADVICE r4): exactly the HammingAutoCapWarning class, naming
        # the cap and the escape hatch
        cap_warns = [
            w for w in caught
            if issubclass(w.category, H.HammingAutoCapWarning)
        ]
        assert cap_warns, "auto cap engaged without a driver warning"
        assert "max_key_group=None" in str(cap_warns[0].message)
        capped = {tuple(r) for r in capped_df.collect()}
        exact = {
            tuple(r)
            for r in hamming_pairs(
                sketches, radius=10, max_key_group=None
            ).collect()
        }
        assert capped <= exact
        assert len(capped) < len(exact)  # cap 2 must actually truncate
        assert all(h <= 10 for _, _, h in capped)
        # same-sketch pairs bypass the key join -> never dropped by a cap
        assert all(p in capped for p in exact if p[2] == 0)
        from imageduplicatefinder_spark.operators.hamming_lsh import (
            hamming_key_stats,
        )
        stats = hamming_key_stats(sketches, radius=10)
        assert stats.filter(F.col("capped")).count() > 0
        assert stats.filter(
            F.col("capped") & (F.col("group_size") <= 2)
        ).count() == 0
    finally:
        H.AUTO_CAP_MIN_SKETCHES = old_cap_min
        H.AUTO_MAX_KEY_GROUP = old_cap
        H.AUTO_M2_MIN_SKETCHES = old_m2


def test_hamming_key_stats_profile_no_cap(spark, sketches):
    """Below the auto threshold the stats frame is a pure key-skew
    profile: every row capped=false, group sizes sum to the total key
    row count."""
    from imageduplicatefinder_spark.operators.hamming_lsh import (
        hamming_key_stats,
    )

    stats = hamming_key_stats(sketches, radius=10)
    assert stats.filter(F.col("capped")).count() == 0
    n_keys = sketch_keys(
        sketches.select("simhash").distinct(), 10, sketch_col="simhash",
        n_sketches=sketches.select("simhash").distinct().count(),
    ).count()
    total = stats.agg(F.sum("group_size")).collect()[0][0]
    assert total == n_keys
