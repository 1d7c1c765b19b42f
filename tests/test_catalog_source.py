"""The catalog-table source/sink (Iceberg-facing surface): identifier
vs path dispatch, DataFrameWriterV2 round-trip through the session
catalog (the same API an Iceberg catalog plugs into), and the
fail-fast paths."""

import pytest

from imageduplicatefinder_spark.sources import (
    is_catalog_ref,
    load_corpus,
    write_corpus,
)


def test_ref_classification():
    assert is_catalog_ref("corpus")
    assert is_catalog_ref("db.corpus")
    assert is_catalog_ref("lake.db.corpus")
    assert not is_catalog_ref("/data/corpus.parquet")
    assert not is_catalog_ref("data/corpus")
    assert not is_catalog_ref("corpus.parquet/")
    assert not is_catalog_ref("3bad.name")
    # bare file names with data extensions are paths, not tables —
    # 'corpus.jsonl' must reach load_corpus's JSONL branch
    assert not is_catalog_ref("corpus.jsonl")
    assert not is_catalog_ref("data.parquet")
    assert not is_catalog_ref("shard.json")
    assert not is_catalog_ref("dump.csv")
    assert not is_catalog_ref("corpus.jsonl.gz")
    # …but a genuine dotted table identifier still dispatches to the
    # catalog
    assert is_catalog_ref("lake.db.sigs")


def test_extension_named_table_resolved_via_catalog(spark):
    """A genuine catalog table whose NAME equals a data extension
    (db.csv-style) is ambiguous under the extension heuristic; with a
    session available the catalog decides (ADVICE r4) — so the table is
    reachable through load_corpus while a nonexistent 'dump.csv' still
    routes to the path branch."""
    df = spark.createDataFrame([(1, "x")], "doc_id long, content string")
    tbl = "csv"  # session-catalog table literally named 'csv'
    try:
        df.write.mode("overwrite").saveAsTable(tbl)
        full = "default.csv"
        assert is_catalog_ref(full, spark)
        assert load_corpus(spark, full).count() == 1
        # without a session the heuristic stays conservative (path)
        assert not is_catalog_ref(full)
        # a name that exists in no catalog still goes to the path branch
        assert not is_catalog_ref("dump.csv", spark)
    finally:
        spark.sql("DROP TABLE IF EXISTS csv")


def test_catalog_roundtrip_replace_and_append(spark):
    """writeTo().createOrReplace() + append() against the session
    catalog, read back via spark.table — the exact code path that hits
    Iceberg when spark.sql.catalog.* is configured."""
    df = spark.createDataFrame(
        [(1, "r", "p", "c", "py", "x"), (2, "r", "q", "c", "py", "y")],
        "doc_id long, repo string, path string, commit string, "
        "lang string, content string",
    )
    tbl = "idf_catalog_roundtrip"
    try:
        write_corpus(df, tbl, mode="replace")
        got = load_corpus(spark, tbl)
        assert got.count() == 2
        assert got.schema == df.schema
        write_corpus(df.filter("doc_id = 1"), tbl, mode="append")
        assert load_corpus(spark, tbl).count() == 3
        # replace is atomic-overwrite, not append
        write_corpus(df, tbl, mode="replace")
        assert load_corpus(spark, tbl).count() == 2
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_append_to_missing_table_fails_fast(spark):
    df = spark.range(1).selectExpr("id AS doc_id")
    with pytest.raises(Exception):
        write_corpus(df, "idf_catalog_no_such_table", mode="append")


def test_path_roundtrip_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "py", "a"), (2, "go", "b")], "doc_id long, lang string, content string"
    )
    out = str(tmp_path / "corpus_pq")
    write_corpus(df, out, mode="replace", partition_by=("lang",))
    got = load_corpus(spark, out)
    assert got.count() == 2
    # partition column survives as data (partition discovery)
    assert set(got.columns) == {"doc_id", "lang", "content"}
    # partitionBy produced lang=... directories (pruning-capable layout)
    import os

    assert any(d.startswith("lang=") for d in os.listdir(out))


def test_snapshot_read_on_path_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="snapshot"):
        load_corpus(spark, str(tmp_path / "x.parquet"), snapshot_id=7)


def test_bad_mode_rejected(spark):
    with pytest.raises(ValueError, match="mode"):
        write_corpus(spark.range(1), "tbl", mode="merge")
