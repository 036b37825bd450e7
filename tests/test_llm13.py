from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.llm13 import (
    _SIGNS,
    q_dataset_card,
    q_random_projection,
)

SF0001 = "/root/testdata/sf0.001"


def test_random_projection_matches_numpy(spark):
    import numpy as np

    rows = {
        r["vec_id"]: r for r in q_random_projection(spark, SF0001).collect()
    }
    src = load(spark, SF0001, "embeddings").limit(50).collect()
    signs = np.array(_SIGNS, dtype=np.float64)
    for e in src:
        v = np.array(e["embedding"], dtype=np.float64)
        expected = signs @ v / 2.0
        got = np.array([rows[e["vec_id"]][f"p{j}"] for j in range(4)])
        assert np.allclose(got, expected, rtol=1e-12, atol=1e-12)


def test_random_projection_preserves_distances_approximately(spark):
    import numpy as np

    rows = q_random_projection(spark, SF0001).collect()
    src = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load(spark, SF0001, "embeddings").collect()
    }
    proj = {
        r["vec_id"]: np.array([r[f"p{j}"] for j in range(4)]) for r in rows
    }
    ids = sorted(src)[:40]
    ratios = []
    for a, b in zip(ids, ids[1:]):
        d_hi = np.linalg.norm(src[a] - src[b])
        d_lo = np.linalg.norm(proj[a] - proj[b])
        if d_hi > 0:
            ratios.append(d_lo / d_hi)
    # JL with k=4 is noisy per-pair; the MEAN contraction must sit
    # near 1 (the projection is unbiased after the 1/sqrt(k)·sqrt(k/d)
    # scale) — a loose band catches sign/scale bugs
    m = sum(ratios) / len(ratios)
    assert 0.3 < m < 3.0


def test_dataset_card_totals_conserve(spark):
    rows = q_dataset_card(spark, SF0001).collect()
    docs = load(spark, SF0001, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    total_chars = docs.agg(F.sum(F.length("text"))).collect()[0][0]
    assert sum(r["total_chars"] for r in rows) == total_chars
    for r in rows:
        assert 0 <= r["dup_rate"] < 1
        assert 0.0 <= r["avg_quality"] <= 1.0
        assert r["dup_docs"] < r["n_docs"]
        assert abs(r["avg_chars"] - r["total_chars"] / r["n_docs"]) < 1e-9
