"""Evidence for the TF-IDF soft-dedup DISPATCH RULE (queries.py):

- compact vocabulary (the sf0.1 corpus itself, 31 tokens): every token
  is hot, token-keyed schemes degenerate, the dense block-matrix tile
  join wins — measured in BENCH.md round 4 (dense 2.2-2.6 s vs brute
  57-70 s).
- large Zipfian vocabulary (real corpora): most tokens are rare, a few
  are hot; the brute token self-join melts on the df² head while the
  weighted prefix filter prunes exactly those tokens from its join
  keys, and the dense form refuses (vector width = |vocab|).

This tool measures the SECOND regime, which the sf0.1 corpus cannot
exhibit. It derives a deterministic wide-vocab corpus from the sf0.1
documents table (no external data): token t of doc d becomes
``t_g<d mod G>`` — per-group-private vocabulary, so |vocab| ~= 25*G —
EXCEPT that a fixed hash-chosen ~20% head of the base vocabulary stays
UNSUFFIXED in half the groups, giving those tokens df ~= N/2 (hot, but
idf_deci = floor(10*log10(2)) = 3 > 0, so the brute join cannot drop
them). Docs are replicated REP x with distinct ids to scale N. Within a
group the original near-dup structure survives, so the operator still
finds pairs; across groups vocabularies are disjoint.

All three schemes share one definition, so brute and prefix row counts
must be EQUAL (asserted); the dense builder must REFUSE (vocab above
its documented 4096 guard).

Usage: python tools/bench_tfidf_schemes.py [rep] [groups]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from imageduplicatefinder_spark.session import get_spark  # noqa: E402


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    groups = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-tfidf-schemes")

    docs = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    rep_docs = docs.withColumn(
        "copy", F.explode(F.sequence(F.lit(0), F.lit(rep - 1)))
    ).select(
        (F.col("doc_id") * rep + F.col("copy")).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    gid = F.pmod(F.col("doc_id"), F.lit(groups))
    # head tokens (xxhash64(tok) % 5 == 0, ~20% of the base vocab) stay
    # global in EVEN groups only -> df ~= N/2, idf_deci = 3 (> 0: the
    # brute join must carry them); all other tokens go group-private
    wide = rep_docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.filter(F.split("text", " "), lambda t: t != ""),
                lambda t: F.when(
                    (F.pmod(F.xxhash64(t), F.lit(5)) == 0)
                    & (F.pmod(gid, F.lit(2)) == 0),
                    t,
                ).otherwise(F.concat(t, F.lit("_g"), gid.cast("string"))),
            ),
            " ",
        ).alias("text"),
        "lang", "source", "n_chars",
    )
    out_dir = tempfile.mkdtemp(prefix="tfidf_vocab_bench_")
    wide.repartition(32).write.parquet(os.path.join(out_dir, "documents.parquet"))

    from imageduplicatefinder_spark import queries as Q

    n_docs = spark.read.parquet(
        os.path.join(out_dir, "documents.parquet")).count()
    vocab = (
        spark.read.parquet(os.path.join(out_dir, "documents.parquet"))
        .select(F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "").select("t").distinct().count()
    )

    result: dict = {"n_docs": n_docs, "vocab": vocab, "rep": rep,
                    "groups": groups}
    # the AUTO dispatcher must pick PREFIX on this wide-vocab corpus
    # and DENSE on the compact-vocab base corpus — the dispatch rule
    # as code, demonstrated on both regimes (round-4 verdict item 1)
    choice_wide, nv_wide = Q.tfidf_dispatch_choice(spark, out_dir)
    choice_base, nv_base = Q.tfidf_dispatch_choice(spark, base_dir)
    assert choice_wide == "prefix", (choice_wide, nv_wide)
    assert choice_base == "dense", (choice_base, nv_base)
    result["auto_choice_wide"] = f"{choice_wide} (weighted vocab {nv_wide})"
    result["auto_choice_base"] = f"{choice_base} (weighted vocab {nv_base})"
    counts: dict[str, int] = {}
    for scheme in ("tfidf_cosine_prefix_pairs", "tfidf_cosine_pairs",
                   "tfidf_cosine_pairs_auto"):
        t0 = time.time()
        counts[scheme] = Q.QUERIES[scheme](spark, out_dir).count()
        result[scheme + "_wall_s"] = round(time.time() - t0, 2)
    assert counts["tfidf_cosine_pairs"] == counts["tfidf_cosine_prefix_pairs"], counts
    assert counts["tfidf_cosine_pairs_auto"] == counts["tfidf_cosine_pairs"], counts
    result["pairs"] = counts["tfidf_cosine_pairs"]
    try:
        Q.QUERIES["tfidf_cosine_dense_pairs"](spark, out_dir).count()
        result["dense"] = "ran (unexpected at this vocab)"
    except Exception as e:  # noqa: BLE001 - the guard is the expected path
        result["dense"] = f"refused: {str(e)[:80]}"
    print(json.dumps(result), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
