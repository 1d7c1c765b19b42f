from imageduplicatefinder_spark.functions.fingerprints import (
    hamming_distance_col,
    make_fingerprint_udf,
    minhash_numpy,
    shingle_hashes_numpy,
    simhash_numpy,
    tokenize_series,
)

__all__ = [
    "hamming_distance_col",
    "make_fingerprint_udf",
    "minhash_numpy",
    "shingle_hashes_numpy",
    "simhash_numpy",
    "tokenize_series",
]
