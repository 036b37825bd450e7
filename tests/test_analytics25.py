from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics25 import (
    q_batch_session_window,
    q_kth_order_statistic,
    q_log2_histogram,
    q_percent_of_parent,
    q_stream_sliding_agg,
)

SF0001 = "/root/testdata/sf0.001"


def test_sliding_counts_double_the_events(spark):
    """2h windows sliding hourly: every event is counted in exactly
    two windows, so total n_events = 2 * |events|."""
    out = q_stream_sliding_agg(spark, SF0001)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == 2 * load(spark, SF0001, "events").count()


def test_batch_session_window_islands(spark):
    out = q_batch_session_window(spark, SF0001)
    # sessions of one user never overlap
    a = out.select(
        "user_id",
        F.col("session_start").alias("s"),
        F.col("session_end").alias("e"),
    )
    b = a.select(
        F.col("user_id").alias("user_id2"),
        F.col("s").alias("s2"),
        F.col("e").alias("e2"),
    )
    overlap = a.join(
        b,
        (F.col("user_id") == F.col("user_id2"))
        & (F.col("s") < F.col("s2"))
        & (F.col("s2") < F.col("e")),
    )
    assert overlap.count() == 0
    # event conservation
    n = out.agg(F.sum("n_events")).collect()[0][0]
    assert n == load(spark, SF0001, "events").count()


def test_percent_of_parent_shares_sum_to_one(spark):
    rows = q_percent_of_parent(spark, SF0001).collect()
    by_region: dict[str, float] = {}
    for r in rows:
        by_region[r["region"]] = by_region.get(r["region"], 0.0) + r["share_of_region"]
    for region, s in by_region.items():
        assert abs(s - 1.0) < 1e-9, (region, s)


def test_log2_histogram_buckets_are_powers_of_two(spark):
    rows = q_log2_histogram(spark, SF0001).collect()
    n = sum(r["n_orders"] for r in rows)
    assert n == load(spark, SF0001, "orders").filter(
        F.col("o_totalprice") > 0
    ).count()
    for r in rows:
        k = r["log2_bucket"]
        assert 2**k <= r["min_cents"] <= r["max_cents"] < 2 ** (k + 1)


def test_kth_order_statistic_matches_python_sort(spark):
    import math

    rows = load(spark, SF0001, "customer").collect()
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r["c_mktsegment"], []).append(
            (r["c_acctbal"], r["c_custkey"])
        )
    got = {
        r["c_mktsegment"]: (r["n"], r["k"], r["p90_acctbal"])
        for r in q_kth_order_statistic(spark, SF0001).collect()
    }
    assert set(got) == set(by_seg)
    for seg, xs in by_seg.items():
        xs.sort()
        n = len(xs)
        k = math.ceil(0.9 * n)
        assert got[seg] == (n, k, xs[k - 1][0])
