"""Binary-quantization invariants: packing parity against an
independent NumPy bit-packer, self-distance zero, Hamming symmetry,
and the recall panel's structural bounds."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.llm33 import (
    _hamming_topk,
    pack_sign_bits,
    q_hamming_recall,
)

SF0001 = "/root/testdata/sf0.001"


def _numpy_pack(vec):
    """Independent reference packer: bit i of word (i // 32)."""
    lo = hi = 0
    for i, x in enumerate(vec):
        if float(x) > 0.0:
            if i < 32:
                lo |= 1 << i
            else:
                hi |= 1 << (i - 32)
    return lo, hi


def test_pack_parity_with_numpy(spark):
    """Spark's in-row aggregate packing must match a bit-by-bit
    Python packer on every vector (threshold, bit order, word split)."""
    emb = load(spark, SF0001, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    got = {
        r.vec_id: (r.code_lo, r.code_hi)
        for r in pack_sign_bits(emb).collect()
    }
    assert len(got) == len(rows)
    for r in rows:
        assert got[r.vec_id] == _numpy_pack(r.embedding), r.vec_id
        # both words must stay in unsigned-32 range (sign-safe packing)
        lo, hi = got[r.vec_id]
        assert 0 <= lo < 1 << 32 and 0 <= hi < 1 << 32


def test_hamming_range_and_no_self(spark):
    """Distances live in [0, 64]; the query itself never appears in
    its own top-k; ranks are exactly 1..k per query."""
    top = _hamming_topk(spark, SF0001).collect()
    assert top
    by_q = {}
    for r in top:
        assert 0 <= r.hamming <= 64
        assert r.vec_id != r.qid
        by_q.setdefault(r.qid, []).append(r.rnk)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_recall_bounds_and_better_than_random(spark):
    """Per-query recall in [0,1]; aggregate recall must beat the
    expected overlap of a RANDOM 10-of-n ranking by a wide margin —
    sign bits of correlated vectors preserve neighborhood structure
    (this is the property that makes 1-bit codes servable at all)."""
    rec = q_hamming_recall(spark, SF0001).collect()
    assert len(rec) == 20
    for r in rec:
        assert 0.0 <= r.recall <= 1.0
        assert r.n_hit == int(round(r.recall * 10))
    n = load(spark, SF0001, "embeddings").count()
    random_expect = 10.0 / (n - 1)  # P(hit) for one slot
    agg = sum(r.recall for r in rec) / len(rec)
    assert agg > 10 * random_expect, (agg, random_expect)
