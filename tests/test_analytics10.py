from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics10 import (
    q_funnel_ordered,
    q_hll_mergeable,
    q_pareto_frontier,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans.streaming_q import (
    q_stream_session_window,
)

SF0001 = "/root/testdata/sf0.001"


def test_hll_merge_within_tolerance_of_exact(spark):
    exact = load(spark, SF0001, "events").select("user_id").distinct().count()
    approx = q_hll_mergeable(spark, SF0001).first()["approx_distinct_users"]
    assert abs(approx - exact) <= max(2, 0.05 * exact)


def test_pareto_frontier_is_mutually_nondominated(spark):
    rows = q_pareto_frontier(spark, SF0001).collect()
    assert rows
    for a in rows:
        for b in rows:
            if a["l_suppkey"] == b["l_suppkey"]:
                continue
            dominates = (
                b["revenue"] >= a["revenue"]
                and b["quantity"] >= a["quantity"]
                and (b["revenue"] > a["revenue"] or b["quantity"] > a["quantity"])
            )
            assert not dominates


def test_funnel_counts_are_monotone(spark):
    r = q_funnel_ordered(spark, SF0001).first()
    assert r["n_view"] >= r["n_view_click"] >= r["n_full_funnel"] >= 0
    assert r["n_view"] > 0


def test_stream_sessions_match_batch_islands(spark):
    out = q_stream_session_window(spark, SF0001)
    ev = load(spark, SF0001, "events")
    # total events preserved across sessions
    assert out.agg(F.sum("n_events")).first()[0] == ev.count()
    # session_end is always start + >= gap (end = last event + 30 min)
    bad = out.filter(
        F.col("session_end") < F.col("session_start") + F.expr("INTERVAL 30 MINUTES")
    ).count()
    assert bad == 0
