"""Dump `.explain("formatted")` for the round-6 optimization targets
into plans/r06/<query>_<tag>.txt (tag = before|after).

Usage: python tools/dump_plans_r06.py <tag> [sf_dir] [query ...]

Queries whose builder runs eager driver jobs (connected components)
execute those while the frame is constructed — use a small sf_dir.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

TARGETS = [
    "simhash_hamming_pairs",
    "simhash_radius_clusters",
    "tfidf_cosine_dense_pairs",
    "decontaminate_vs_eval",
    "winnow_match_pairs",
    "ngram_jaccard_pairs",
    "near_dup_clusters_exact",
    "dedup_funnel_stats",
    "edit_distance_pairs",
    "ann_cosine_topk",
    "embedding_near_dup_pairs",
    "ngram_jaccard_prefix_pairs",
    "duplicate_ngram_coverage",
    "winnowing_fingerprints",
    "minhash_band_pairs_portable",
]


def main() -> None:
    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or TARGETS
    from imageduplicatefinder_spark.queries import QUERIES
    from imageduplicatefinder_spark.session import get_spark

    spark = get_spark(app_name="dump_plans_r06", master="local[8]",
                      shuffle_partitions=8)
    os.makedirs("plans/r06", exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = f"plans/r06/{name}_{tag}.txt"
        with open(out, "w") as f:
            f.write(plan)
        print(f"wrote {out} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
