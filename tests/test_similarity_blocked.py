"""Exactness of the blocked near-dup plan: the IVF-cell +
triangle-inequality-pruned variant must return the IDENTICAL pair set
as the all-pairs crossJoin baseline, at thresholds where the result
is non-empty and pairs straddle cells."""

from __future__ import annotations

import pytest

from lakehouse_ecommerce_etl_pipeline_spark.llm.similarity import (
    cosine_near_dup_pairs,
    cosine_near_dup_pairs_blocked,
)

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return sorted(
        (r["id_a"], r["id_b"], r["cosine_sim"]) for r in df.collect()
    )


@pytest.mark.parametrize("threshold", [0.8, 0.3, 0.15])
def test_blocked_equals_bruteforce(spark, threshold):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    brute = _pairs(cosine_near_dup_pairs(emb, threshold))
    blocked = _pairs(cosine_near_dup_pairs_blocked(emb, threshold))
    assert blocked == brute


def test_blocked_nontrivial_pruning_structure(spark):
    # low threshold on random-ish vectors → pairs exist, span cells
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = cosine_near_dup_pairs_blocked(emb, 0.15, n_cells=8)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["id_a"] < r["id_b"] for r in rows)


def test_blocked_no_cartesian_in_plan(spark):
    """The blocked default's physical plan must not contain a
    CartesianProduct node (the quadratic all-pairs shape)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = cosine_near_dup_pairs_blocked(emb, 0.8)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
