from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics15 import (
    q_abc_classification,
    q_bloom_prefilter_join,
    q_cohort_retention,
    q_event_transitions,
    q_market_basket,
    q_rfm_segments,
    q_tf_cosine_pairs,
    q_time_weighted_avg,
)

SF0001 = "/root/testdata/sf0.001"


def test_cohort_offsets_start_at_zero_and_cover_all_users(spark):
    rows = q_cohort_retention(spark, SF0001).collect()
    assert rows
    assert all(r["month_offset"] >= 0 for r in rows)
    # every customer appears in their cohort's offset-0 cell
    zero = sum(r["n_users"] for r in rows if r["month_offset"] == 0)
    n_cust = (
        load(spark, SF0001, "orders").select("o_custkey").distinct().count()
    )
    assert zero == n_cust


def test_market_basket_pairs_are_canonical_and_sorted(spark):
    rows = q_market_basket(spark, SF0001).collect()
    assert rows
    assert all(r["part_a"] < r["part_b"] for r in rows)
    counts = [r["n_orders"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_event_transition_rows_sum_to_one_per_source(spark):
    df = q_event_transitions(spark, SF0001)
    sums = (
        df.groupBy("from_type").agg(F.sum("p_trans").alias("p")).collect()
    )
    assert sums
    for r in sums:
        assert math.isclose(r["p"], 1.0, rel_tol=1e-9)


def test_rfm_scores_are_quintiles(spark):
    df = q_rfm_segments(spark, SF0001)
    n = df.count()
    for c in ("r_score", "f_score", "m_score"):
        dist = {r[c] for r in df.select(c).distinct().collect()}
        assert dist <= {1, 2, 3, 4, 5}
    # quintile sizes differ by at most 1
    sizes = [
        r["n"]
        for r in df.groupBy("m_score").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert max(sizes) - min(sizes) <= 1
    assert sum(sizes) == n


def test_abc_classes_follow_cumulative_share(spark):
    rows = q_abc_classification(spark, SF0001).collect()
    total = sum(r["revenue"] for r in rows)
    a_share = sum(r["revenue"] for r in rows if r["abc_class"] == "A") / total
    ab_share = (
        sum(r["revenue"] for r in rows if r["abc_class"] in ("A", "B")) / total
    )
    assert a_share <= 0.8 + 1e-9
    assert ab_share <= 0.95 + 1e-9
    # classes are non-empty and A holds the top items
    classes = {r["abc_class"] for r in rows}
    assert "A" in classes and "C" in classes
    top = max(rows, key=lambda r: r["revenue"])
    assert top["abc_class"] == "A"


def test_time_weighted_avg_within_value_range(spark):
    rows = q_time_weighted_avg(spark, SF0001).collect()
    assert rows
    lo, hi = (
        load(spark, SF0001, "events")
        .agg(F.min("value"), F.max("value"))
        .first()
    )
    for r in rows:
        assert lo - 1e-9 <= r["twa_value"] <= hi + 1e-9
        assert r["total_s"] > 0


def test_bloom_prune_equals_exact_semijoin(spark):
    got = q_bloom_prefilter_join(spark, SF0001)
    li = load(spark, SF0001, "lineitem")
    dim = (
        load(spark, SF0001, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey")
    )
    want = li.join(dim, li["l_orderkey"] == dim["o_orderkey"], "leftsemi")
    assert got.count() == want.count()
    assert got.select("l_orderkey").exceptAll(
        want.select("l_orderkey")
    ).count() == 0


def test_tf_cosine_bounds_and_orientation(spark):
    rows = q_tf_cosine_pairs(spark, SF0001).collect()
    assert rows
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 0.0 <= r["cosine"] <= 1.0 + 1e-12
        assert r["dot"] > 0
