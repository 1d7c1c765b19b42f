"""End-to-end pipeline tests on the planted synthetic corpus
(ref style: src/test/java/app/CommandsTest.java golden E2E tests, with
the fixture corpus analog of FIXTURES.md §3)."""

import hashlib
import tempfile
from itertools import combinations

import pytest
from pyspark.sql import functions as F

from imageduplicatefinder_spark.config import DedupConfig
from imageduplicatefinder_spark.plans.pipeline import DedupPipeline
from imageduplicatefinder_spark.sources.generator import (
    GeneratedCorpus,
    corpus_to_dataframe,
    generate_corpus,
)


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(n_families=8, n_background=60, seed=42)


@pytest.fixture(scope="module")
def result(spark, corpus):
    df = corpus_to_dataframe(spark, corpus)
    pipe = DedupPipeline(spark, DedupConfig(), checkpoint_dir=tempfile.mkdtemp())
    return pipe.run(df)


def _found_pairs(result):
    sig = result.documents_hashed.select("doc_id", "repo", "path", "commit").collect()
    key = {r.doc_id: GeneratedCorpus.key(r.repo, r.path, r.commit) for r in sig}
    byc = {}
    for r in result.components.collect():
        byc.setdefault(r.cluster_id, []).append(key[r.doc_id])
    found = set()
    for members in byc.values():
        for a, b in combinations(sorted(members), 2):
            found.add((a, b))
    return found


def test_sha256_per_row_invariant(result, corpus):
    """Per-row content sha256 equality vs the generator oracle
    (BASELINE.json input_hint)."""
    oracle = {
        GeneratedCorpus.key(r, p, c): hashlib.sha256(content.encode()).hexdigest()
        for (r, p, c, _, content) in corpus.rows
    }
    got = result.documents_hashed.select("repo", "path", "commit", "sha256").collect()
    assert len(got) == len(oracle)
    for r in got:
        assert r.sha256 == oracle[GeneratedCorpus.key(r.repo, r.path, r.commit)]


def test_dup_pair_recall_and_precision(result, corpus):
    """north_rule: dup-pair recall >= 0.99 at the pinned config."""
    found = _found_pairs(result)
    tp = corpus.true_pairs
    recall = len(found & tp) / len(tp)
    precision = len(found & tp) / len(found)
    assert recall >= 0.99, f"recall {recall}"
    assert precision >= 0.99, f"precision {precision}"


def test_containment_pairs_found(result, corpus):
    """Watermark-analog: base embedded in host must be caught
    (suffix/shingle containment path)."""
    found = _found_pairs(result)
    base_host = {p for p in corpus.containment_pairs if "/src/base_" in p[0] or "/src/base_" in p[1]}
    got = len(found & base_host) / len(base_host)
    assert got == 1.0


def test_decoys_not_clustered(result):
    decoy_rows = (
        result.clusters.filter(F.col("path").contains("decoy")).count()
    )
    assert decoy_rows == 0


def test_exact_dups_share_cluster(result):
    # base_N and copy_N have identical content -> same cluster always
    pairs = (
        result.clusters.filter(F.col("path").rlike("src/(base|copy)_"))
        .groupBy("repo", "cluster_id")
        .count()
        .filter("count >= 2")
        .count()
    )
    assert pairs == 8  # one per family


def test_one_keep_per_cluster(result):
    agg = (
        result.plan.groupBy("cluster_id")
        .agg(F.sum(F.when(F.col("action") == "KEEP", 1).otherwise(0)).alias("keeps"))
        .collect()
    )
    assert all(r.keeps == 1 for r in agg)


def test_plan_keeper_is_largest(result):
    mx = result.plan.groupBy("cluster_id").agg(F.max("size").alias("mx"))
    keeps = result.plan.filter("action='KEEP'").join(mx, on="cluster_id")
    assert keeps.filter(F.col("size") != F.col("mx")).count() == 0


def test_resume_reuses_checkpoints(spark, corpus):
    df = corpus_to_dataframe(spark, corpus)
    d = tempfile.mkdtemp()
    DedupPipeline(spark, DedupConfig(), checkpoint_dir=d).run(df)
    pipe2 = DedupPipeline(spark, DedupConfig(), checkpoint_dir=d)
    pipe2.run(df)
    assert all(m.reused for m in pipe2.ckpt.metrics)


def test_resume_different_corpus_recomputes(spark, corpus):
    """Same config + same checkpoint_dir but a DIFFERENT input must
    recompute every stage, not replay the previous corpus's results
    (checkpoint identity = config_hash + input signature)."""
    d = tempfile.mkdtemp()
    df1 = corpus_to_dataframe(spark, corpus)
    DedupPipeline(spark, DedupConfig(), checkpoint_dir=d).run(df1)
    other = generate_corpus(n_families=3, n_background=20, seed=7)
    df2 = corpus_to_dataframe(spark, other)
    pipe2 = DedupPipeline(spark, DedupConfig(), checkpoint_dir=d)
    res2 = pipe2.run(df2)
    assert not any(m.reused for m in pipe2.ckpt.metrics)
    assert res2.documents_hashed.count() == df2.count()


def test_doc_id_collision_still_raises(spark, monkeypatch):
    """The collision guard runs concurrently with the downstream stages
    (guide §2.6 job overlap) but ``run`` must still raise before
    returning. A real xxhash64 collision can't be synthesized from
    data, so inject a degenerate hash (constant doc_id) and assert the
    deferred check surfaces as RuntimeError."""
    import imageduplicatefinder_spark.plans.pipeline as pl
    from imageduplicatefinder_spark.operators.signatures import (
        hash_documents,
    )

    def colliding_hash(documents, langs=None):
        return hash_documents(documents, langs=langs).withColumn(
            "doc_id", F.lit(1).cast("long")
        )

    monkeypatch.setattr(pl, "hash_documents", colliding_hash)
    docs = spark.createDataFrame(
        [("r", "a.py", "c1", "py", "alpha beta gamma delta " * 5),
         ("r", "b.py", "c1", "py", "totally different words here " * 5)],
        "repo string, path string, commit string, lang string, content string",
    )
    with pytest.raises(RuntimeError, match="doc_id collision"):
        DedupPipeline(spark, DedupConfig(),
                      checkpoint_dir=tempfile.mkdtemp()).run(docs)


def test_null_key_column_does_not_false_alarm_collision_guard(spark):
    """Null commit (a legitimately incomplete natural key) must not trip
    the doc_id collision check — count_distinct over bare columns skips
    null-containing rows; the guard counts a never-null struct."""
    docs = spark.createDataFrame(
        [("r", "a.py", None, "py", "alpha beta gamma delta " * 5),
         ("r", "b.py", None, "py", "totally different words here " * 5)],
        "repo string, path string, commit string, lang string, content string",
    )
    res = DedupPipeline(spark, DedupConfig(),
                        checkpoint_dir=tempfile.mkdtemp()).run(docs)
    assert res.documents_hashed.count() == 2  # no RuntimeError


def test_corrupt_meta_sidecar_recomputes(spark, corpus):
    """A truncated _meta.json (crash mid-dump) must read as 'checkpoint
    absent' and recompute — not permanently fail every resume."""
    import os

    df = corpus_to_dataframe(spark, corpus)
    d = tempfile.mkdtemp()
    DedupPipeline(spark, DedupConfig(), checkpoint_dir=d).run(df)
    # corrupt one stage's sidecar
    cfg_hash = DedupConfig().config_hash()
    meta = os.path.join(d, "signatures", cfg_hash, "_meta.json")
    with open(meta, "w") as f:
        f.write('{"stage": "signatu')  # truncated
    pipe2 = DedupPipeline(spark, DedupConfig(), checkpoint_dir=d)
    pipe2.run(df)  # must not raise
    by_stage = {m.stage: m.reused for m in pipe2.ckpt.metrics}
    assert by_stage["signatures"] is False      # recomputed
    assert by_stage["documents_hashed"] is True  # others still reused


def test_metrics_table_records_reused_rows(spark, corpus):
    """Resumed runs append reused=true rows to the durable _metrics
    table — the per-partition proof of what a resume reused."""
    df = corpus_to_dataframe(spark, corpus)
    d = tempfile.mkdtemp()
    p1 = DedupPipeline(spark, DedupConfig(), checkpoint_dir=d)
    p1.run(df)
    p2 = DedupPipeline(spark, DedupConfig(), checkpoint_dir=d)
    p2.run(df)
    m = p2.ckpt.metrics_table()
    assert m.filter("reused").count() > 0
    assert m.filter("NOT reused").count() > 0


def test_pipeline_star_cc_produces_identical_plan(spark, tmp_path):
    """cc_algorithm='star' must yield the same clusters and keeper plan
    as the default label propagation (H4-style dispatch for the
    clustering stage)."""
    from imageduplicatefinder_spark.config import DedupConfig
    from imageduplicatefinder_spark.plans.pipeline import DedupPipeline
    from imageduplicatefinder_spark.sources.generator import (
        corpus_to_dataframe,
        generate_corpus,
    )

    docs = corpus_to_dataframe(
        spark, generate_corpus(n_families=4, n_background=30, seed=17)
    )
    res_lp = DedupPipeline(
        spark, DedupConfig(), checkpoint_dir=str(tmp_path / "lp")
    ).run(docs)
    res_star = DedupPipeline(
        spark, DedupConfig(cc_algorithm="star"),
        checkpoint_dir=str(tmp_path / "star"),
    ).run(docs)
    lp = {(r.cluster_id, r.path, r.action) for r in res_lp.plan.collect()}
    star = {(r.cluster_id, r.path, r.action) for r in res_star.plan.collect()}
    assert lp == star and len(lp) > 0


def test_radius_from_threshold_matches_reference_formula():
    """Web-path conversion (ref: app/Commands.java:406-410):
    radius = round((1 - t) * 64)."""
    from imageduplicatefinder_spark.config import DedupConfig

    assert DedupConfig.radius_from_threshold(1.0) == 0
    assert DedupConfig.radius_from_threshold(0.84375) == 10  # CLI default
    assert DedupConfig.radius_from_threshold(0.5) == 32
    assert DedupConfig.radius_from_threshold(0.0) == 64


def test_pipeline_langs_filter_restricts_corpus(spark, tmp_path):
    """The pushed-down extension-filter analog on the pipeline entry
    (ref: app/Commands.java:74): only matching langs are processed."""
    import tempfile

    from imageduplicatefinder_spark.config import DedupConfig
    from imageduplicatefinder_spark.plans.pipeline import DedupPipeline

    body = "alpha beta gamma delta epsilon " * 10
    docs = spark.createDataFrame(
        [("r", "a.py", "c1", "py", body),
         ("r", "b.py", "c2", "py", body + "tail"),
         ("r", "c.go", "c3", "go", body),
         ("r", "d.go", "c4", "go", body + "tail")],
        "repo string, path string, commit string, lang string, content string",
    )
    res = DedupPipeline(
        spark, DedupConfig(), checkpoint_dir=tempfile.mkdtemp()
    ).run(docs, langs=["py"])
    paths = {r.path for r in res.plan.collect()}
    assert paths == {"a.py", "b.py"}  # go docs never enter the pipeline


@pytest.mark.parametrize("scheme", ["prefix", "exact"])
def test_pipeline_candidate_scheme_recall(spark, corpus, scheme):
    """candidates="prefix" (AllPairs/PPJoin, exact for the verify rule)
    and candidates="exact" (inverted-index self-join) must reach the
    same recall/precision bar as the LSH default on the planted
    corpus — prefix filtering has NO recall knob, so anything below
    1.0 recall here is a prefix-length bug, not tuning."""
    df = corpus_to_dataframe(spark, corpus)
    pipe = DedupPipeline(
        spark, DedupConfig(candidates=scheme),
        checkpoint_dir=tempfile.mkdtemp(),
    )
    res = pipe.run(df)
    found = _found_pairs(res)
    tp = corpus.true_pairs
    recall = len(found & tp) / len(tp)
    precision = len(found & tp) / len(found)
    assert recall >= 0.99, f"{scheme} recall {recall}"
    assert precision >= 0.99, f"{scheme} precision {precision}"


def test_candidates_scheme_config_hash():
    """Non-default candidate schemes must invalidate checkpoints
    (different pair semantics); the "lsh" default must hash identically
    to the pre-knob format so existing checkpoints stay valid."""
    lsh = DedupConfig().config_hash()
    assert DedupConfig(candidates="prefix").config_hash() != lsh
    assert DedupConfig(candidates="exact").config_hash() != lsh
    assert DedupConfig(candidates="lsh").config_hash() == lsh
    with pytest.raises(ValueError):
        DedupConfig(candidates="minhash")


def test_pipeline_memory_durability_matches_disk(spark, corpus):
    """durability="memory" (localCheckpoint stages, no parquet) must
    produce the identical plan to the durable disk mode — it changes
    WHERE stages materialize, never what they compute."""
    df = corpus_to_dataframe(spark, corpus)
    disk = DedupPipeline(
        spark, DedupConfig(), checkpoint_dir=tempfile.mkdtemp()
    ).run(df)
    mem_pipe = DedupPipeline(
        spark, DedupConfig(), checkpoint_dir=tempfile.mkdtemp(),
        durability="memory",
    )
    mem = mem_pipe.run(df)
    d = {(r.cluster_id, r.path, r.action) for r in disk.plan.collect()}
    m = {(r.cluster_id, r.path, r.action) for r in mem.plan.collect()}
    assert d == m and len(d) > 0
    # metrics still recorded per stage, none marked reused
    assert len(mem_pipe.ckpt.metrics) > 0
    assert not any(s.reused for s in mem_pipe.ckpt.metrics)
    with pytest.raises(ValueError):
        DedupPipeline(spark, DedupConfig(),
                      checkpoint_dir=tempfile.mkdtemp(),
                      durability="ram")


def test_quality_gate_filters_ingest(spark):
    """With cfg.quality_gate on, minified/autogenerated junk never
    reaches the hash stage; the surviving twins still cluster; the
    enabled gate gets its own config hash (checkpoints don't cross)."""
    body = "alpha beta gamma delta epsilon zeta\n" * 8
    docs = spark.createDataFrame(
        [
            ("r", "a.py", "c1", "py", body),
            ("r", "b.py", "c2", "py", body),            # exact twin
            ("r", "gen.py", "c3", "py",
             "AUTO-GENERATED do not edit\n" + body),    # autogen marker
            ("r", "min.js", "c4", "js", "x" * 2000),    # minified blob
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    gated_cfg = DedupConfig(quality_gate=True)
    res = DedupPipeline(spark, gated_cfg,
                        checkpoint_dir=tempfile.mkdtemp()).run(docs)
    hashed = {r.path for r in res.documents_hashed.collect()}
    assert hashed == {"a.py", "b.py"}
    plan = {r.path: r.action for r in res.plan.collect()}
    assert sorted(plan.values()) == ["DELETE", "KEEP"]
    # gate off: everything is hashed (reference behavior)
    res_off = DedupPipeline(spark, DedupConfig(),
                            checkpoint_dir=tempfile.mkdtemp()).run(docs)
    assert res_off.documents_hashed.count() == 4
    assert gated_cfg.config_hash() != DedupConfig().config_hash()
