"""Content fingerprinting: k-shingles -> MinHash signature + 64-bit SimHash.

Spark-native generalization of the reference's perceptual hashers
(ref: src/main/java/hash/AHash.java:7-30, DHash.java:7-34,
PHashDct.java:13-57 — all ``BufferedImage -> 64-bit long``): here the
payload is text/source-code, the 64-bit sketch is a SimHash over token
hashes (mean-threshold bit test, the aHash analog), and the MinHash
signature adds a Jaccard-estimating family the reference lacks.

All kernels are numpy-vectorized and run inside Arrow-batched pandas
UDFs — no per-row Python UDFs (BASELINE.json input_hint mandate).
Hamming verification stays fully JVM-side via ``bit_count(a ^ b)``
(ref: src/main/java/hash/Hamming.java:4-6).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from imageduplicatefinder_spark.config import DedupConfig

_WORD_RE = re.compile(r"\w+")


def _perm_params(num_perm: int, seed: int) -> np.ndarray:
    """One 64-bit key per MinHash slot. Each slot's permutation is
    ``splitmix64_mix(x + key)`` — a bijection of uint64 (add-key is
    bijective, the finalizer is bijective), i.e. a genuine random
    permutation family. A linear ``(a*x+b) mod p`` family is NOT usable
    here: with x « p it is near-monotone in x, so all slots share one
    argmin and signature agreement no longer estimates Jaccard.
    """
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 64, size=num_perm, dtype=np.uint64)


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain; Steele et al. 2014) —
    vectorized, wrapping uint64 arithmetic."""
    h = h.copy()
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


def tokenize_series(content: pd.Series, tokenizer: str) -> pd.Series:
    """Series[str] -> Series[list[str]]. Word tokens (lowercased \\w+ runs)
    or characters of the whitespace-collapsed lowercased string."""
    s = content.fillna("")
    if tokenizer == "word":
        return s.str.lower().str.findall(_WORD_RE)
    # char tokenizer: canonicalize whitespace then split to chars
    canon = s.str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
    return canon.map(list)


def shingle_hashes_numpy(tokens: list[str], k: int) -> np.ndarray:
    """Distinct k-shingle hashes (uint64) of one token list.

    Shingles of docs shorter than k collapse to the whole-doc shingle,
    so tiny docs still fingerprint (degenerate family, FIXTURES.md §3).
    """
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n < k:
        shingles = ["\x1f".join(tokens)]
    else:
        shingles = ["\x1f".join(tokens[i : i + k]) for i in range(n - k + 1)]
    h = pd.util.hash_array(np.asarray(shingles, dtype=object))  # uint64, deterministic
    return np.unique(h)


def minhash_numpy(shingle_hashes: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """MinHash signature (int64[num_perm]) of one shingle-hash set.

    sig[i] = min over the set of the i-th keyed 64-bit permutation;
    P(sig_A[i] == sig_B[i]) == Jaccard(A, B) exactly. Returned as the
    bit-identical int64 view (Spark LongType carries the 64 bits;
    ordering across docs is irrelevant, only equality is used).
    """
    if shingle_hashes.size == 0:
        return np.full(keys.shape[0], np.int64(np.iinfo(np.int64).max), dtype=np.int64)
    perms = _mix64(shingle_hashes[None, :] + keys[:, None])  # (num_perm, n)
    return perms.min(axis=1).view(np.int64)


def simhash_numpy(token_hashes: np.ndarray) -> np.int64:
    """64-bit SimHash of one doc's token-hash multiset.

    Bit j is set iff more than half the tokens have bit j set — the
    mean-threshold rule generalizing aHash's ``px >= mean`` bit test
    (ref: src/main/java/hash/AHash.java:21-29). Empty doc -> 0, matching
    the reference's black-image pHash == 0L golden
    (ref: src/test/java/hash/PHashDctTest.java:49-60).
    """
    n = token_hashes.size
    if n == 0:
        return np.int64(0)
    bits = np.unpackbits(token_hashes.view(np.uint8).reshape(n, 8), axis=1)
    counts = bits.sum(axis=0, dtype=np.int64)  # 64 counts
    out_bits = (counts * 2 > n).astype(np.uint8)
    return np.packbits(out_bits).view(np.uint64)[0].astype(np.int64)


def _fingerprint_batch(
    content: pd.Series, cfg: DedupConfig, keys: np.ndarray
) -> pd.DataFrame:
    token_lists = tokenize_series(content, cfg.tokenizer)
    minhashes: list[list[int]] = []
    simhashes: list[int] = []
    shingle_cols: list[list[int]] = []
    n_tokens: list[int] = []
    for tokens in token_lists:
        sh = shingle_hashes_numpy(tokens, cfg.shingle_k)
        minhashes.append(minhash_numpy(sh, keys).tolist())
        if tokens:
            th = pd.util.hash_array(np.asarray(tokens, dtype=object))
        else:
            th = np.empty(0, dtype=np.uint64)
        simhashes.append(int(simhash_numpy(th)))
        shingle_cols.append(sh.astype(np.int64).tolist())
        n_tokens.append(len(tokens))
    return pd.DataFrame(
        {
            "minhash": minhashes,
            "simhash": simhashes,
            "shingles": shingle_cols,
            "n_tokens": n_tokens,
        }
    )


FINGERPRINT_SCHEMA = T.StructType(
    [
        T.StructField("minhash", T.ArrayType(T.LongType(), False)),
        T.StructField("simhash", T.LongType()),
        T.StructField("shingles", T.ArrayType(T.LongType(), False)),
        T.StructField("n_tokens", T.IntegerType()),
    ]
)


def make_fingerprint_udf(cfg: DedupConfig):
    """Scalar-iterator pandas UDF ``content -> struct<minhash, simhash,
    shingles, n_tokens>`` (ref UDF surface: hash/Hasher.java:4-7 —
    the reference's one extension point, reformulated Arrow-batched)."""
    keys = _perm_params(cfg.num_perm, cfg.seed)

    @pandas_udf(FINGERPRINT_SCHEMA)
    def fingerprint(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for content in batches:
            yield _fingerprint_batch(content, cfg, keys)

    return fingerprint


def hamming_distance_col(x: Column, y: Column) -> Column:
    """JVM-side Hamming distance ``popcount(x XOR y)``
    (ref: src/main/java/hash/Hamming.java:4-6)."""
    return F.bit_count(x.bitwiseXOR(y))
