"""Unit tests for operators/prefix_join.py: the EXACTNESS property.

prefix_candidates must be a SUPERSET of every pair satisfying the
verify rule (jaccard >= t_j OR containment >= t_c) — the module
docstring's two-leg guarantee — including at the exact threshold
boundaries, on degenerate docs, and regardless of which side is
smaller. Ground truth is computed in plain Python over the same
shingle sets. The pipeline-level recall test covers realistic corpora;
these pin the boundary arithmetic (epsilon-guarded ceil, PPJoin length
filter) where an off-by-one would silently lose recall.
"""

from __future__ import annotations

import itertools

import pytest

from imageduplicatefinder_spark.config import DedupConfig
from imageduplicatefinder_spark.operators.prefix_join import (
    exact_candidates,
    prefix_candidates,
)


def _sig_df(spark, docs: dict[int, list[int]]):
    rows = [(i, sh) for i, sh in docs.items()]
    return spark.createDataFrame(rows, "doc_id long, shingles array<long>")


def _qualifying(docs: dict[int, list[int]], cfg: DedupConfig):
    out = set()
    for a, b in itertools.combinations(sorted(docs), 2):
        sa, sb = set(docs[a]), set(docs[b])
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        jac = inter / len(sa | sb)
        cont = inter / min(len(sa), len(sb))
        if (
            jac >= cfg.jaccard_threshold
            or cont >= cfg.containment_threshold
        ):
            out.add((a, b))
    return out


CASES = {
    "boundary_jaccard": {
        # |A∩B|=2, |A∪B|=4 -> jaccard exactly 0.5 (the threshold)
        1: [10, 11, 12],
        2: [10, 11, 13],
        3: [90, 91, 92],  # disjoint decoy
    },
    "boundary_containment": {
        # small fully minus one: 4/5 = 0.8 containment exactly
        1: [1, 2, 3, 4, 5],
        2: [1, 2, 3, 4, 99, 98, 97, 96, 95, 94],
        3: [50, 51],
    },
    "identical_and_subset": {
        1: [7, 8, 9],
        2: [7, 8, 9],          # identical (jaccard 1.0)
        3: [7, 8, 9, 10, 11],  # superset (containment 1.0 of doc 1)
        4: [600],
    },
    "degenerate": {
        1: [],                # empty shingle set
        2: [42],              # single shingle
        3: [42],              # single shingle, identical
        4: [43],
    },
    "below_both_thresholds": {
        1: [1, 2, 3, 4, 5, 6, 7, 8, 9, 10],
        2: [1, 2, 3, 104, 105, 106, 107, 108, 109, 110],  # j=0.18, c=0.3
    },
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_prefix_candidates_superset_of_qualifying(spark, name):
    docs = CASES[name]
    cfg = DedupConfig()
    got = {
        (r.src, r.dst)
        for r in prefix_candidates(_sig_df(spark, docs), cfg).collect()
    }
    need = _qualifying(docs, cfg)
    assert need <= got, f"{name}: missing {need - got}"
    # and never wider than the exhaustive inverted-index superset
    allp = {
        (r.src, r.dst)
        for r in exact_candidates(_sig_df(spark, docs)).collect()
    }
    assert got <= allp, f"{name}: fabricated {got - allp}"


def test_prefix_candidates_tight_thresholds(spark):
    """thresholds near 1.0: only identical sets must qualify, and the
    prefix shrinks to ~1 shingle per doc — the regime where an
    off-by-one in the epsilon-guarded ceil would drop the last key."""
    docs = {1: [1, 2, 3, 4], 2: [1, 2, 3, 4], 3: [1, 2, 3, 5], 4: [9]}
    cfg = DedupConfig(jaccard_threshold=0.99, containment_threshold=0.99)
    got = {
        (r.src, r.dst)
        for r in prefix_candidates(_sig_df(spark, docs), cfg).collect()
    }
    assert (1, 2) in got  # identical pair must survive
