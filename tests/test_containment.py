from pyspark.sql import functions as F

from imageduplicatefinder_spark.operators.containment import containment_verify


def test_containment_verify_exact_and_canonical(spark):
    docs = spark.createDataFrame(
        [
            (1, "def f():\n    return 1"),
            (2, "HEADER\n\ndef f():\n    return 1\n\nFOOTER"),       # contains 1
            (3, "def  f():\n  return  1"),                           # ws-variant of 1
            (4, "something else entirely"),
        ],
        "doc_id long, content string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "src long, dst long")
    got = {(r.src, r.dst): r for r in containment_verify(pairs, docs).collect()}
    assert got[(1, 2)].contained and got[(1, 2)].offset == 8
    assert not got[(1, 3)].contained and got[(1, 3)].contained_canonical
    assert not got[(1, 4)].contained and not got[(1, 4)].contained_canonical
    assert got[(1, 4)].offset == -1


def test_containment_empty_small_side(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "anything")], "doc_id long, content string"
    )
    pairs = spark.createDataFrame([(1, 2)], "src long, dst long")
    r = containment_verify(pairs, docs).collect()[0]
    assert r.contained and r.offset == 0  # empty string trivially contained


def test_containment_verify_grouped_matches_plain(spark):
    from imageduplicatefinder_spark.operators.containment import (
        containment_verify_grouped,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta"),
            (2, "X alpha beta Y"),
            (3, "alpha  beta"),
            (4, "nothing shared"),
            (5, "Z X alpha beta Y W"),
        ],
        "doc_id long, content string",
    )
    # (2,3)/(2,4): the bigger host doc 2 sits on the SRC side (smaller
    # doc_id) — the grouped form must group by the host, not by dst
    pairs = spark.createDataFrame(
        [(1, 2), (3, 2), (4, 2), (2, 5), (2, 3), (2, 4)], "src long, dst long"
    )
    plain = {(r.src, r.dst): (r.contained, r.contained_canonical, r.offset)
             for r in containment_verify(pairs, docs).collect()}
    grouped = {(r.src, r.dst): (r.contained, r.contained_canonical, r.offset)
               for r in containment_verify_grouped(pairs, docs).collect()}
    assert plain == grouped
    assert grouped[(1, 2)][0] and grouped[(2, 5)][0]
    assert not grouped[(4, 2)][0]


def test_containment_candidates_find_high_ratio_pairs(spark):
    """The candidate generator must surface 'snippet embedded in a much
    bigger host' pairs — the exact shape MinHash bands miss (J ~ 1/ratio)."""
    from imageduplicatefinder_spark.config import DedupConfig
    from imageduplicatefinder_spark.operators.containment import (
        containment_candidates,
    )
    from imageduplicatefinder_spark.operators.signatures import compute_signatures

    snippet = " ".join(f"tok{i}" for i in range(40))
    filler = " ".join(f"host{i}" for i in range(400))
    rows = [
        ("r", "snippet.py", "c1", "py", snippet),
        ("r", "host.py", "c2", "py", filler + " " + snippet),     # ratio ~11
        ("r", "unrelated.py", "c3", "py",
         " ".join(f"zzz{i}" for i in range(40))),
    ]
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    sig = compute_signatures(docs, DedupConfig())
    ids = {r.path: r.doc_id for r in sig.select("path", "doc_id").collect()}
    got = {(r.src, r.dst) for r in containment_candidates(sig).collect()}
    want = (min(ids["snippet.py"], ids["host.py"]),
            max(ids["snippet.py"], ids["host.py"]))
    assert want in got
    for a, b in got:  # unrelated doc never pairs
        assert ids["unrelated.py"] not in (a, b)


def test_containment_null_content_treated_as_empty(spark):
    """NULL content must behave as '' (trivially contained), not abort
    the Arrow task — matching the oracle's coalesce."""
    docs = spark.createDataFrame(
        [(1, None), (2, "anything")], "doc_id long, content string"
    )
    pairs = spark.createDataFrame([(1, 2)], "src long, dst long")
    r = containment_verify(pairs, docs).collect()[0]
    assert r.contained and r.offset == 0
    from imageduplicatefinder_spark.operators.containment import (
        containment_verify_grouped,
    )

    g = containment_verify_grouped(pairs, docs).collect()[0]
    assert g.contained and g.offset == 0


def test_suffix_array_matches_sorted_suffixes_and_find():
    """_suffix_array == naive sorted-suffix order; _sa_find == str.find
    for present and absent patterns (including empty and repeated-hit
    patterns, where first TEXTUAL occurrence != first SA entry)."""
    import random

    from imageduplicatefinder_spark.operators.containment import (
        _sa_find,
        _suffix_array,
    )

    rng = random.Random(42)
    for _ in range(120):
        s = "".join(rng.choice("abAB \t\nxyz") for _ in range(rng.randint(0, 50)))
        sa = _suffix_array(s)
        assert list(sa) == sorted(range(len(s)), key=lambda i: s[i:])
        for _ in range(6):
            if s and rng.random() < 0.7:
                i = rng.randrange(len(s))
                p = s[i : rng.randint(i, len(s))]
            else:
                p = "".join(rng.choice("abq") for _ in range(rng.randint(0, 4)))
            assert _sa_find(s, sa, p) == s.find(p), (s, p)
    s = "ab" * 500  # 499 overlapping hits of "ba": first offset must win
    sa = _suffix_array(s)
    assert _sa_find(s, sa, "ba") == 1
    assert _sa_find(s, sa, "") == 0
    assert _sa_find(s, sa, "ac") == -1


def test_containment_grouped_suffix_array_matches_find(spark):
    """Forcing the suffix-array probe primitive must be bit-identical
    to the find() path on exact, canonical-only, and miss pairs."""
    from imageduplicatefinder_spark.operators.containment import (
        containment_verify_grouped,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta"),
            (2, "X alpha beta Y alpha beta Z"),   # two hits: offset = first
            (3, "alpha  \t beta"),                # canonical-only
            (4, "nothing shared"),
            (5, "Z X alpha beta Y W"),
        ],
        "doc_id long, content string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (3, 2), (4, 2), (2, 5), (2, 3), (2, 4)], "src long, dst long"
    )
    plain = {(r.src, r.dst): (r.contained, r.contained_canonical, r.offset)
             for r in containment_verify_grouped(
                 pairs, docs, use_suffix_array=False).collect()}
    sa = {(r.src, r.dst): (r.contained, r.contained_canonical, r.offset)
          for r in containment_verify_grouped(
              pairs, docs, use_suffix_array=True).collect()}
    assert plain == sa
    assert sa[(1, 2)] == (True, True, 2)


def test_canon_is_explicit_ascii_whitespace_only(spark):
    """_canon collapses exactly [ \\t\\n\\f\\r] (the oracle's regex
    class); \\x0b and Unicode spaces are NOT whitespace here, unlike
    str.split() — cross-engine canonical decisions depend on it."""
    from imageduplicatefinder_spark.operators.containment import _canon

    assert _canon("a \t\n\f\r b") == "a b"
    assert _canon("  x  ") == "x"
    assert _canon("a\x0bb") == "a\x0bb"      # vertical tab preserved
    assert _canon("a\xa0b") == "a\xa0b"      # NBSP preserved


def test_use_suffix_array_rejects_bad_mode(spark):
    """A misspelled mode ("force", "true") must raise, not silently
    fall through to the find() path."""
    import pytest as _pytest

    from imageduplicatefinder_spark.operators.containment import (
        containment_verify_grouped,
    )

    docs = spark.createDataFrame([(1, "a")], "doc_id long, content string")
    pairs = spark.createDataFrame([(1, 1)], "src long, dst long")
    with _pytest.raises(ValueError, match="use_suffix_array"):
        containment_verify_grouped(pairs, docs, use_suffix_array="force")


def test_lone_surrogate_host_degrades_to_find(spark):
    """A host string containing a lone surrogate breaks the utf-32
    encode behind the suffix array; the probe must degrade to find()
    instead of aborting the task (str.find handles surrogates fine)."""
    from imageduplicatefinder_spark.operators.containment import (
        containment_verify_grouped,
    )

    host = "prefix \ud800 alpha beta suffix"
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, host), (3, "missing")],
        "doc_id long, content string",
    )
    pairs = spark.createDataFrame([(1, 2), (3, 2)], "src long, dst long")
    got = {(r.src, r.dst): (r.contained, r.offset)
           for r in containment_verify_grouped(
               pairs, docs, use_suffix_array=True).collect()}
    assert got[(1, 2)] == (True, host.find("alpha beta"))
    assert got[(3, 2)] == (False, -1)
