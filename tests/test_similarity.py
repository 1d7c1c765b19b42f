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
