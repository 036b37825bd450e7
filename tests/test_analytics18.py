from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics18 import (
    q_bitmap_distinct,
    q_bpe_token_count,
    q_grouping_id,
    q_hyperplane_lsh,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import REGISTRY

SF0001 = "/root/testdata/sf0.001"


def test_bpe_count_at_least_whitespace_count(spark):
    rows = q_bpe_token_count(spark, SF0001).collect()
    assert rows
    # splitting digits/punctuation can only add tokens
    assert all(r["n_bpe_tokens"] >= r["n_ws_tokens"] for r in rows)


def test_bitmap_distinct_equals_count_distinct(spark):
    got = {
        r["o_orderpriority"]: r["n_distinct_cust"]
        for r in q_bitmap_distinct(spark, SF0001).collect()
    }
    want = {
        r["o_orderpriority"]: r["n"]
        for r in load(spark, SF0001, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    assert got == want


def test_grouping_id_levels(spark):
    rows = q_grouping_id(spark, SF0001).collect()
    gids = {r["gid"] for r in rows}
    assert gids == {0, 1, 3}  # detail, status subtotal, grand total
    grand = [r for r in rows if r["gid"] == 3]
    assert len(grand) == 1
    total = load(spark, SF0001, "orders").count()
    assert grand[0]["n_orders"] == total
    # subtotals tie out to detail rows
    detail = sum(r["n_orders"] for r in rows if r["gid"] == 0)
    assert detail == total


def test_hyperplane_lsh_buckets_consistent(spark):
    rows = q_hyperplane_lsh(spark, SF0001).collect()
    n_vecs = load(spark, SF0001, "embeddings").count()
    assert len(rows) == n_vecs
    sizes: dict[str, int] = {}
    for r in rows:
        assert len(r["bucket"]) == 8 and set(r["bucket"]) <= {"0", "1"}
        sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
    for r in rows:
        assert r["n_in_bucket"] == sizes[r["bucket"]]
    # hashing actually spreads vectors over multiple buckets
    assert len(sizes) > 1


# ---- physical-plan regressions for the new tiers (scale contracts)


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF0001)
    return df._jdf.queryExecution().executedPlan().toString()


def test_bloom_prune_broadcasts_filter_and_dim(spark):
    plan = _plan(spark, "q_bloom_prefilter_join")
    # r4 shape: the densified filter cross-broadcasts as ONE row
    # (BroadcastNestedLoopJoin), the exact dim broadcasts for the
    # semi join — lineitem rows AND keys never cross an exchange
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan


def test_reservoir_sample_uses_window_group_limit(spark):
    plan = _plan(spark, "q_reservoir_per_group")
    assert "WindowGroupLimit" in plan


def test_mode_per_group_uses_window_group_limit(spark):
    plan = _plan(spark, "q_mode_per_group")
    assert "WindowGroupLimit" in plan


def test_salted_aggregate_is_two_phase(spark):
    plan = _plan(spark, "q_salted_aggregate")
    # partial+final for both phases — at least 3 HashAggregate nodes
    assert plan.count("HashAggregate") >= 3


def test_market_basket_top50_avoids_global_sort(spark):
    plan = _plan(spark, "q_market_basket")
    assert "TakeOrderedAndProject" in plan
