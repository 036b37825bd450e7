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
    # the query releases the exact count plus the tolerance verdict
    # (the sketch estimate itself is engine-specific, r4 refactor)
    exact = load(spark, SF0001, "events").select("user_id").distinct().count()
    row = q_hll_mergeable(spark, SF0001).first()
    assert row["n_exact"] == exact
    assert row["within_tolerance"] is True


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


def test_kmeans_covers_all_rows_and_inertia_decreases(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.llm.kmeans import (
        assign_clusters,
        kmeans,
        update_centroids,
    )

    emb = load(spark, SF0001, "embeddings")
    n = emb.count()
    out = kmeans(emb, k=4, iters=2)
    assert out.count() == n
    assert out.filter(F.col("cluster").isNull()).count() == 0
    assert out.select("cluster").distinct().count() <= 4
    # Lloyd's monotonicity: one update+reassign never increases inertia
    seeds = [
        [float(x) for x in r[0]]
        for r in emb.orderBy("vec_id").limit(4).select("embedding").collect()
    ]
    a0 = assign_clusters(emb, seeds)
    i0 = a0.agg(F.sum("dist_sq")).first()[0]
    c1 = update_centroids(a0, dim=64)
    a1 = assign_clusters(emb, c1)
    i1 = a1.agg(F.sum("dist_sq")).first()[0]
    assert i1 <= i0 * (1 + 1e-9)
