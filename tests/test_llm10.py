from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.llm10 import (
    q_dup_rate_by_source,
    q_pairwise_distance_histogram,
)

SF0001 = "/root/testdata/sf0.001"


def test_distance_histogram_counts_sampled_pairs(spark):
    rows = q_pairwise_distance_histogram(spark, SF0001).collect()
    assert rows
    n = load(spark, SF0001, "embeddings").count()
    all_pairs = n * (n - 1) // 2
    sampled = sum(r["n_pairs"] for r in rows)
    # hash gate keeps ~1/16 of pairs; allow generous slack
    assert all_pairs / 32 < sampled < all_pairs / 8
    assert all(r["log2_bucket"] >= 0 for r in rows)
    # deterministic across reruns
    again = sum(
        r["n_pairs"]
        for r in q_pairwise_distance_histogram(spark, SF0001).collect()
    )
    assert again == sampled


def test_dup_rate_by_source_bounds_and_coverage(spark):
    rows = q_dup_rate_by_source(spark, SF0001).collect()
    docs = load(spark, SF0001, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert {r["source"] for r in rows} == {
        x["source"] for x in docs.select("source").distinct().collect()
    }
    for r in rows:
        assert 0 <= r["n_dup_docs"] <= r["n_docs"]
        assert abs(r["dup_rate"] - r["n_dup_docs"] / r["n_docs"]) < 1e-12
    assert any(r["n_dup_docs"] > 0 for r in rows)
