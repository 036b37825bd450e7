"""Tier XL (ROUGE-2 pairwise overlap): pure-Python parity."""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF0001 = "/root/testdata/sf0.001"


def _bigrams(text: str) -> Counter:
    toks = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
    return Counter(
        f"{a}|{b}" for a, b in zip(toks, toks[1:])
    ) if len(toks) >= 2 else Counter()


def test_rouge2_pairs_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.llm39 import (
        q_rouge2_pairs,
    )

    got = {
        r.doc_a: r for r in q_rouge2_pairs(spark, SF0001).collect()
    }
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF0001}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    pairs = [
        (d, d + 1) for d in docs if d % 2 == 0 and d + 1 in docs
    ]
    assert len(got) == len(pairs) > 0
    for a, b in pairs:
        ca, cb = _bigrams(docs[a]), _bigrams(docs[b])
        ov = sum((ca & cb).values())
        ta, tb = sum(ca.values()), sum(cb.values())
        r = got[a]
        assert (r.doc_b, r.overlap_bigrams, r.bigrams_a, r.bigrams_b) == (
            b, ov, ta, tb,
        )
        if ta + tb == 0:
            assert r.rouge2_f1 is None
        else:
            assert r.rouge2_f1 == 2 * ov / (ta + tb)
