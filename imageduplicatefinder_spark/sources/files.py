"""Recursive filesystem source — the literal S1/S2 analog.

The reference's scan stage walks a directory tree and keeps paths
matching a case-insensitive extension regex, then loads each file's
bytes (ref: src/main/java/app/Commands.java:72-84 `Files.walk` +
`(?i).*\\.(jpg|jpeg|png|bmp)` + per-file load with error skip). The
Spark-first form is the built-in ``binaryFile`` data source:

- ``recursiveFileLookup`` = the `Files.walk` recursion,
- ``pathGlobFilter``      = the extension filter, applied at LISTING
  time (excluded files are never opened — cheaper than the reference,
  which stats every path), and
- the (path, modificationTime, length, content) output row = the
  reference's per-file metadata + payload in one columnar scan.

At 100 TB the same source works against S3/HDFS globs; listing
parallelizes on the driver's thread pool and each file becomes a scan
partition (small files should be compacted upstream, as with any
Spark file source).

Glob alternation note: Hadoop's GlobFilter is case-sensitive, so the
reference's ``(?i)`` is reproduced by emitting each extension in both
cases (``*.{py,PY}``). Mixed-case extensions (``.Py``) are rare enough
that listing-time pruning is the right trade; pass
``case_insensitive_regex=True`` to add the exact (?i) post-filter at
the cost of opening every file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scan_files(
    spark: SparkSession,
    root: str,
    extensions: tuple[str, ...] = ("py", "java", "go"),
    recursive: bool = True,
    case_insensitive_regex: bool = False,
) -> DataFrame:
    """Recursively scan ``root`` for files with the given extensions.

    Output: (path string, modificationTime timestamp, length long,
    content binary) — one row per matched file.
    """
    exts = sorted({e.lstrip(".").lower() for e in extensions})
    if not exts:
        raise ValueError("at least one extension required")
    reader = spark.read.format("binaryFile").option(
        "recursiveFileLookup", "true" if recursive else "false"
    )
    if case_insensitive_regex:
        # exact (?i) parity: no listing-time glob, regex post-filter
        df = reader.load(root)
        pat = "(?i).*\\.(" + "|".join(exts) + ")$"
        return df.filter(F.col("path").rlike(pat))
    alts = ",".join(f"{e},{e.upper()}" for e in exts)
    return reader.option("pathGlobFilter", f"*.{{{alts}}}").load(root)


def files_as_documents(
    files: DataFrame,
    repo: str = "fs",
    encoding: str = "UTF-8",
    errors: str = "skip",
) -> DataFrame:
    """Map scanned files into the documents/input_hint shape consumed by
    the dedup pipeline: (repo, path, commit, lang, content string).

    ``errors`` is the per-file decode-failure policy (S4 analog, ref:
    app/Commands.java:76-84 — the reference SKIPS files that fail to
    load rather than failing the run). Under Spark 4's default ANSI
    mode a plain ``decode`` THROWS on the first malformed byte, killing
    the whole job on one bad file, so:

    - ``"skip"``    (default, reference parity): files whose bytes are
      not valid UTF-8 are dropped (``is_valid_utf8`` on the raw binary).
    - ``"replace"``: keep every file; invalid sequences become U+FFFD
      (binary->string cast semantics).
    - ``"strict"``: raise on the first malformed file (plain decode) —
      also the path taken for any non-UTF-8 ``encoding``, where Spark
      has no validity predicate.

    ``commit`` has no filesystem analog; the content sha256 stands in as
    the version marker (stable across rescans of unchanged files, which
    keeps checkpoint identity and doc_ids stable too). ``lang`` is the
    lowercased extension. ``mtime``/``size`` ride along for the keeper
    policy (W2 metadata precompute, ref: app/Commands.java:207-209).
    """
    if errors not in ("skip", "replace", "strict"):
        raise ValueError(f"unknown errors policy {errors!r}")
    utf8 = encoding.upper().replace("-", "") == "UTF8"
    if errors == "strict" or not utf8:
        text = F.decode(F.col("content"), encoding)
    else:
        if errors == "skip":
            files = files.filter(F.expr("is_valid_utf8(content)"))
        text = F.col("content").cast("string")
    return files.select(
        F.lit(repo).alias("repo"),
        F.col("path"),
        F.sha2(F.col("content"), 256).alias("commit"),
        F.lower(F.regexp_extract("path", r"\.([^./\\]+)$", 1)).alias("lang"),
        text.alias("content"),
        F.col("modificationTime").alias("mtime"),
        F.col("length").alias("size"),
    )


def files_as_media(files: DataFrame, kind: str = "image") -> DataFrame:
    """Map scanned files into the multimodal media shape
    (id, kind, data binary) feeding extract_features/phash64."""
    return files.select(
        F.xxhash64("path").alias("id"),
        F.lit(kind).alias("kind"),
        F.col("content").alias("data"),
    )
