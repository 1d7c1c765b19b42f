"""Reference CSV checkpoint interop (S5-S8 parsing semantics)."""

from imageduplicatefinder_spark.sources.reference_csv import (
    read_reference_clusters,
    read_reference_hashes,
    read_reference_plan,
    write_reference_clusters,
    write_reference_hashes,
    write_reference_plan,
)


def test_read_hashes_last_comma_and_unsigned(spark, tmp_path):
    """Last-comma split (paths may contain commas), blank/comma-less
    lines skipped, unsigned text > 2^63 maps to a negative long —
    Long.parseUnsignedLong parity (ref: Commands.java:130-141)."""
    f = tmp_path / "hashes.csv"
    f.write_text(
        "a.jpg,123\n"
        "\n"                                   # blank -> skipped
        "no_comma_line\n"                      # comma-less -> skipped
        "dir,with,commas/b.jpg,18446744073709551615\n"  # 2^64-1 -> -1
        "c.jpg,9223372036854775808\n"          # 2^63 -> Long.MIN_VALUE
    )
    got = {r.path: r.sketch
           for r in read_reference_hashes(spark, str(f)).collect()}
    assert got == {
        "a.jpg": 123,
        "dir,with,commas/b.jpg": -1,
        "c.jpg": -(1 << 63),
    }


def test_hashes_round_trip(spark, tmp_path):
    rows = [("x.png", -1), ("y,z.png", 42), ("w.png", -(1 << 63))]
    df = spark.createDataFrame(rows, "path string, sketch long")
    out = str(tmp_path / "hashes_out")
    write_reference_hashes(df, out)
    back = {(r.path, r.sketch)
            for r in read_reference_hashes(spark, out).collect()}
    assert back == set(rows)
    # the written text is the reference's unsigned decimal form
    texts = {r.value for r in spark.read.text(out).collect()}
    assert "x.png,18446744073709551615" in texts


def test_read_clusters_first_comma(spark, tmp_path):
    f = tmp_path / "clusters.csv"
    f.write_text(
        "uuid-1,a.jpg\n"
        "uuid-1,dir,with,commas/b.jpg\n"   # path keeps its commas
        "\n"
        "uuid-2,c.jpg\n"
    )
    got = {(r.cluster_id, r.path)
           for r in read_reference_clusters(spark, str(f)).collect()}
    assert got == {
        ("uuid-1", "a.jpg"),
        ("uuid-1", "dir,with,commas/b.jpg"),
        ("uuid-2", "c.jpg"),
    }


def test_plan_round_trip_and_action_coercion(spark, tmp_path):
    f = tmp_path / "plan.csv"
    f.write_text(
        "clusterId,action,path,reason\n"
        "u1,KEEP,a.jpg,keeper\n"
        "u1,delete,b.jpg,dupe\n"
        "u1,banana,c.jpg,odd\n"       # unknown action -> keep (ref)
    )
    got = {r.path: r.action
           for r in read_reference_plan(spark, str(f)).collect()}
    assert got == {"a.jpg": "keep", "b.jpg": "delete", "c.jpg": "keep"}

    df = read_reference_plan(spark, str(f))
    out = str(tmp_path / "plan_out")
    write_reference_plan(df, out)
    back = {(r.cluster_id, r.action, r.path)
            for r in read_reference_plan(spark, out).collect()}
    assert back == {(r.cluster_id, r.action, r.path) for r in df.collect()}


def test_imported_hashes_drive_radius_search(spark, tmp_path):
    """The migration workflow end-to-end: a reference hashes.csv feeds
    the engine's distributed Hamming-radius search directly (the
    reference's BK-tree query, ref: index/BKTreeIndex.java:34-50)."""
    from imageduplicatefinder_spark.operators.hamming_lsh import hamming_pairs

    f = tmp_path / "hashes.csv"
    f.write_text(
        "a.jpg,100\n"       # bit pattern 0b1100100
        "b.jpg,101\n"       # hamming(100,101)=1
        "c.jpg,18446744073709551615\n"  # all-ones, far from both
    )
    sk = read_reference_hashes(spark, str(f))
    ids = sk.selectExpr("xxhash64(path) AS id", "sketch")
    pairs = hamming_pairs(ids, radius=2, id_col="id", sketch_col="sketch")
    assert pairs.count() == 1  # only (a, b)


def test_out_of_range_hash_raises(spark, tmp_path):
    """parseUnsignedLong parity: 2^64 must raise, not alias to 0 (a
    silent 0-sketch would fabricate Hamming-0 duplicates)."""
    import pytest

    f = tmp_path / "bad.csv"
    f.write_text("x.jpg,18446744073709551616\n")
    with pytest.raises(Exception, match="out of unsigned-64 range"):
        read_reference_hashes(spark, str(f)).collect()


def test_null_sink_columns_raise(spark, tmp_path):
    import pytest

    df = spark.createDataFrame([("a.jpg", None)], "path string, sketch long")
    with pytest.raises(Exception, match="NULL sketch"):
        write_reference_hashes(df, str(tmp_path / "h"))


def test_plan_quotes_and_newlines_round_trip(spark, tmp_path):
    """Doubled-quote escaping + multiLine: quote- and newline-bearing
    fields must survive our own writer/reader pair (and the doubled
    quotes are what the reference's commons-csv loader parses)."""
    rows = [("u1", "keep", 'photos/"best" pics/a.jpg', "line1\nline2")]
    df = spark.createDataFrame(
        rows, "cluster_id string, action string, path string, reason string"
    )
    out = str(tmp_path / "plan_q")
    write_reference_plan(df, out)
    back = read_reference_plan(spark, out).collect()
    assert len(back) == 1
    assert back[0].path == 'photos/"best" pics/a.jpg'
    assert back[0].reason == "line1\nline2"
    # on-disk form uses doubled quotes, not backslash escapes
    import glob

    text = "".join(open(p).read() for p in glob.glob(out + "/*.csv"))
    assert '""best""' in text and '\\"' not in text
