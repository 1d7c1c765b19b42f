"""Recursive filesystem source (S1/S2 analog, ref: Commands.java:72-84)."""

import tempfile

from imageduplicatefinder_spark.sources.files import (
    files_as_documents,
    files_as_media,
    scan_files,
)


def _make_tree(tmp_path):
    (tmp_path / "a.py").write_text("def f(): return 1")
    (tmp_path / "b.PY").write_text("def f(): return 1")      # upper ext
    (tmp_path / "notes.txt").write_text("not code")          # filtered out
    sub = tmp_path / "deep" / "deeper"
    sub.mkdir(parents=True)
    (sub / "c.java").write_text("class C {}")
    (sub / "d.Py").write_text("mixed case ext")              # glob misses
    return tmp_path


def test_scan_files_recursion_and_extension_filter(spark, tmp_path):
    root = str(_make_tree(tmp_path))
    got = scan_files(spark, root, extensions=("py", "java"))
    paths = {r.path.rsplit("/", 1)[-1] for r in got.collect()}
    # recursion reaches deep/deeper; txt filtered; both-case glob matches
    assert paths == {"a.py", "b.PY", "c.java"}
    row = {r.path.rsplit("/", 1)[-1]: r for r in got.collect()}["a.py"]
    assert bytes(row.content) == b"def f(): return 1"
    assert row.length == len(b"def f(): return 1")


def test_scan_files_case_insensitive_regex_mode(spark, tmp_path):
    root = str(_make_tree(tmp_path))
    got = scan_files(spark, root, extensions=("py",),
                     case_insensitive_regex=True)
    paths = {r.path.rsplit("/", 1)[-1] for r in got.collect()}
    assert paths == {"a.py", "b.PY", "d.Py"}  # exact (?i) parity


def test_scan_files_non_recursive(spark, tmp_path):
    root = str(_make_tree(tmp_path))
    got = scan_files(spark, root, extensions=("py", "java"), recursive=False)
    paths = {r.path.rsplit("/", 1)[-1] for r in got.collect()}
    assert "c.java" not in paths and "a.py" in paths


def test_files_as_documents_shape_and_pipeline(spark, tmp_path):
    """Scanned files run the full dedup pipeline end-to-end: a copied
    file collapses in the exact pre-pass and lands in the keeper plan."""
    from imageduplicatefinder_spark.config import DedupConfig
    from imageduplicatefinder_spark.plans.pipeline import DedupPipeline

    body = "shared duplicate content alpha beta gamma " * 20
    (tmp_path / "orig.py").write_text(body)
    (tmp_path / "copy.py").write_text(body)
    (tmp_path / "other.py").write_text(
        "totally different words nothing shared " * 20
    )
    docs = files_as_documents(scan_files(spark, str(tmp_path),
                                         extensions=("py",)))
    assert set(docs.columns) >= {"repo", "path", "commit", "lang",
                                 "content", "mtime", "size"}
    langs = {r.lang for r in docs.select("lang").collect()}
    assert langs == {"py"}
    res = DedupPipeline(
        spark, DedupConfig(), checkpoint_dir=tempfile.mkdtemp()
    ).run(docs.select("repo", "path", "commit", "lang", "content"))
    plan = res.plan.collect()
    by_action = {r.path.rsplit("/", 1)[-1]: r.action for r in plan}
    assert sorted(by_action.values()) == ["DELETE", "KEEP"]
    assert set(by_action) == {"orig.py", "copy.py"}  # other.py singleton


def test_files_as_media_feeds_multimodal(spark, tmp_path):
    from imageduplicatefinder_spark.operators.multimodal import extract_features

    (tmp_path / "x.bin").write_bytes(bytes(range(64)))
    (tmp_path / "y.bin").write_bytes(bytes(range(64)))
    media = files_as_media(scan_files(spark, str(tmp_path),
                                      extensions=("bin",)))
    feats = {r.id: r.feature for r in
             extract_features(media, decode="fake").collect()}
    assert len(feats) == 2
    vals = list(feats.values())
    assert vals[0] == vals[1]  # identical bytes -> identical features


def test_files_as_documents_decode_error_policies(spark, tmp_path):
    """Reference parity (S4 per-file error skip): one non-UTF-8 file
    must not kill the job under Spark 4's ANSI mode."""
    import pytest

    (tmp_path / "good.py").write_text("valid utf8 content")
    (tmp_path / "bad.py").write_bytes(b"broken \xff\xfe bytes")
    files = scan_files(spark, str(tmp_path), extensions=("py",))

    skipped = files_as_documents(files, errors="skip")
    names = {r.path.rsplit("/", 1)[-1] for r in skipped.collect()}
    assert names == {"good.py"}

    replaced = files_as_documents(files, errors="replace")
    by_name = {r.path.rsplit("/", 1)[-1]: r.content for r in replaced.collect()}
    assert set(by_name) == {"good.py", "bad.py"}
    assert "�" in by_name["bad.py"]

    with pytest.raises(Exception, match="MALFORMED_CHARACTER_CODING"):
        files_as_documents(files, errors="strict").collect()


def test_jsonl_round_trip_and_bad_line_policies(spark, tmp_path):
    """JSONL corpus source: explicit-schema read round-trips the
    writer's output; a malformed line is skipped / quarantined /
    fatal per the bad_lines policy (S4 per-row error isolation)."""
    import pytest

    from imageduplicatefinder_spark.sources import (
        read_documents_jsonl,
        write_documents_jsonl,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}", "en", "s", 6) for i in range(10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "corpus")
    write_documents_jsonl(docs, out, num_shards=3)
    back = read_documents_jsonl(spark, out)
    assert sorted((r.doc_id, r.text) for r in back.collect()) == [
        (i, f"text {i}") for i in range(10)
    ]
    # deterministic sharding: same data -> same shard membership
    import glob

    shards1 = sorted(glob.glob(out + "/part-*"))
    assert len(shards1) == 3

    # malformed line handling
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n'
    )
    good = read_documents_jsonl(spark, str(raw), bad_lines="skip")
    assert {r.doc_id for r in good.collect()} == {1, 2}
    # aggregate-only consumer: column pruning must not leave the scan
    # referencing only the corrupt column (the JSON data source raises
    # QUERY_ONLY_CORRUPT_RECORD_COLUMN for that shape; the text +
    # from_json reader has no such restriction)
    assert read_documents_jsonl(spark, str(raw), bad_lines="skip").count() == 2
    assert read_documents_jsonl(spark, str(raw), bad_lines="keep").count() == 3

    kept = read_documents_jsonl(spark, str(raw), bad_lines="keep")
    rows = kept.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(bad) == 1 and "not json" in bad[0]._corrupt_record

    with pytest.raises(Exception):
        read_documents_jsonl(spark, str(raw), bad_lines="strict").collect()

    with pytest.raises(ValueError):
        read_documents_jsonl(spark, str(raw), bad_lines="wat")
