"""Candidate-growth bench for the radius-10 Hamming plan.

Measures candidate sketch pairs (pre-verify join output) at two corpus
sizes S and 4S for three schemes:

- m=1: classic single-chunk pigeonhole (radius+1 chunks of 5-6 bits) —
  for uniform random sketches ~20% of ALL pairs collide in >=1 chunk
  (9 chunks of 6 bits + 2 of 5: 9/64 + 2/32 = 0.203), i.e. a
  barely-disguised quadratic;
- m=2: Manku-style block-pair combination keys (12 blocks, 66 combos,
  10-12-bit keys) — same exhaustive guarantee, ~5x lower collision
  constant (66/2^10.67 = 0.04);
- m=2 + per-key cap: the bounded plan. After the cap each
  (key_id, key_val) group holds <= cap sketches, so candidates are
  <= S * C(B,m) * cap — LINEAR in S, with capped keys accounted in
  key_stats.

Exhaustive Hamming radius 10/64 is intrinsically near-quadratic on
uniform sketches (an exhaustive scheme with >=34-bit keys would need
C(21,11) ~ 352k combo rows per sketch), so the honest scale path is
m=2 for the constant plus the cap for the bound; real near-dup sketch
distributions (clustered families, most pairs far apart) sit between
the planted-family and uniform extremes measured here.

Usage: python tools/bench_hamming_candidates.py [N] [radius]
Prints one JSON line per (scheme, size) plus growth exponents
log(c_4N/c_N)/log(4)  (2.0 = quadratic, 1.0 = linear).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from imageduplicatefinder_spark.operators.hamming_lsh import (  # noqa: E402
    _auto_max_key_group,
    _auto_n_agree,
    capped_sketch_keys,
    sketch_keys,
)
from imageduplicatefinder_spark.session import get_spark  # noqa: E402


def synth_sketches(spark, n: int) -> DataFrame:
    """Deterministic clustered sketch distribution: 80% unique random
    sketches (xxhash64 of the row id), 20% in families of 5 whose
    members flip <=4 pseudo-random bit positions of a family base —
    the planted near-dup structure a real corpus sketch table has."""
    df = spark.range(n)
    fam = (F.col("id") / 5).cast("long")
    in_family = (F.col("id") % 10) < 2  # 2 of 10 rows -> families of 5
    base = F.xxhash64(fam.cast("string"), F.lit("fam"))
    # flip k = id%5 bits at positions derived from (id, i)
    flips = F.lit(0).cast("long")
    for i in range(4):
        bit = F.expr(
            f"shiftleft(1L, cast(pmod(xxhash64(id, {i}), 64) as int))"
        )
        flips = F.when(F.col("id") % 5 > i, flips.bitwiseXOR(bit)).otherwise(
            flips
        )
    family_sketch = base.bitwiseXOR(flips)
    unique_sketch = F.xxhash64("id", F.lit("solo"))
    return df.select(
        F.col("id").alias("doc_id"),
        F.when(in_family, family_sketch).otherwise(unique_sketch)
        .alias("simhash"),
    )


def count_candidates(sketches: DataFrame, radius: int, n_agree: int,
                     cap: int | None) -> dict:
    keys = sketch_keys(sketches, radius, n_agree=n_agree,
                       sketch_col="simhash")
    n_capped = 0
    if cap is not None:
        keys, stats = capped_sketch_keys(keys, cap)
        n_capped = stats.filter(F.col("capped")).count()
    keys = keys.localCheckpoint(eager=True)
    t0 = time.monotonic()
    cand = (
        keys.select("key_id", "key_val", F.col("sketch").alias("sk_a"))
        .join(keys.select("key_id", "key_val",
                          F.col("sketch").alias("sk_b")),
              on=["key_id", "key_val"])
        .filter(F.col("sk_a") < F.col("sk_b"))
    )
    n_cand = cand.count()
    return {
        "candidates": n_cand,
        "capped_keys": n_capped,
        "join_sec": round(time.monotonic() - t0, 2),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000
    radius = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    # scheme spec: comma-separated m1 / m2 / m2_capK (default all three)
    spec = sys.argv[3] if len(sys.argv) > 3 else "m1,m2,m2_cap128"
    spark = get_spark(app_name="bench_hamming_candidates",
                      master="local[8]", shuffle_partitions=16)
    schemes = []
    for s in spec.split(","):
        if s == "auto":
            # the operator's default policy, resolved per corpus size
            # below — NO manual flag, the round-4 verdict criterion
            schemes.append((s, None, "auto"))
            continue
        m = int(s[1])
        cap = int(s.split("_cap")[1]) if "_cap" in s else None
        schemes.append((s, m, cap))
    results: dict[str, dict[int, dict]] = {}
    for size in (n, 4 * n):
        sk = synth_sketches(spark, size).localCheckpoint(eager=True)
        n_distinct = sk.select("simhash").distinct().count()
        for name, m, cap in schemes:
            if name == "auto":
                m = _auto_n_agree(radius, n_distinct)
                cap = _auto_max_key_group(radius, n_distinct)
            r = count_candidates(sk, radius, m, cap)
            if name == "auto":
                r.update(resolved_m=m, resolved_cap=cap)
            r.update(size=size, distinct_sketches=n_distinct, scheme=name)
            results.setdefault(name, {})[size] = r
            print(json.dumps(r), flush=True)
    import math

    for name, by_size in results.items():
        c1, c4 = by_size[n]["candidates"], by_size[4 * n]["candidates"]
        exp = math.log(max(c4, 1) / max(c1, 1)) / math.log(4)
        print(json.dumps({"scheme": name, "growth_exponent": round(exp, 3),
                          "candidates_N": c1, "candidates_4N": c4}),
              flush=True)


if __name__ == "__main__":
    main()
