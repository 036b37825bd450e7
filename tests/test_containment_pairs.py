"""q_containment_pairs rep-collapse equivalence (round 10).

The r10 sf1 stress caught the inverted-index self-join going
quadratic in duplicates (190 s at sf1 on the 10x-replicated corpus).
The fix mines pairs on one representative per distinct shingle SET
(shingle_set_reps_artifact) and expands through the member map —
this test pins BIT-EQUIVALENCE against a brute-force Python
reference on a corpus engineered to hit every branch: exact
duplicates (within-group expansion), a short doc embedded in a long
one (directed cross pair), duplicates of both endpoints (cross
fan-out), sub-3-token docs (absent from output), and non-matching
documents."""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics36 import (
    _CONTAIN_THRESH,
    q_containment_pairs,
)

DOCS = [
    # short doc wholly embedded in a long one (directed containment)
    (1, "alpha beta gamma delta epsilon zeta"),
    (2, "alpha beta gamma delta"),
    (3, "alpha beta gamma delta"),          # duplicate of 2
    (4, "alpha beta gamma delta"),          # duplicate of 2
    (5, "alpha beta gamma delta epsilon zeta"),  # duplicate of 1
    (6, "one two"),                          # < 3 tokens: no shingles
    (7, "totally different words here now"),
    (8, "beta gamma delta epsilon"),         # partial overlap
]


def _shingles(text):
    t = text.strip().split(" ")
    return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)} if len(t) >= 3 else set()


def _reference():
    sh = {d: _shingles(t) for d, t in DOCS}
    out = set()
    for a, sa in sh.items():
        if not sa:
            continue
        for b, sb in sh.items():
            if a == b or not sb:
                continue
            n = len(sa & sb)
            if n and n / len(sa) >= _CONTAIN_THRESH:
                out.add((a, b, n, len(sa), n / len(sa)))
    return out


def test_containment_matches_bruteforce_on_duplicate_corpus(spark, tmp_path):
    sf_dir = str(tmp_path / "sfc")
    os.makedirs(sf_dir)
    pd.DataFrame(DOCS, columns=["doc_id", "text"]).to_parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    got = {
        (r.id_a, r.id_b, r.n_inter, r.sz_a, r.containment)
        for r in q_containment_pairs(spark, sf_dir).collect()
    }
    assert got == _reference()
