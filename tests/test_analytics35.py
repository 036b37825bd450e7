from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics35 import (
    q_discount_depth,
    q_return_rate_monthly,
)

SF0001 = "/root/testdata/sf0.001"


def test_return_rate_conserves_lines(spark):
    rows = q_return_rate_monthly(spark, SF0001).collect()
    li = load(spark, SF0001, "lineitem")
    assert sum(r["n_lines"] for r in rows) == li.count()
    total_r = li.filter(F.col("l_returnflag") == "R").count()
    assert sum(r["n_returned"] for r in rows) == total_r
    for r in rows:
        assert 0 <= r["return_rate"] <= 1


def test_discount_depth_bands_partition_lines(spark):
    rows = q_discount_depth(spark, SF0001).collect()
    li = load(spark, SF0001, "lineitem")
    assert sum(r["n_lines"] for r in rows) == li.count()
    for r in rows:
        assert 0 <= r["discount_pct"] <= 100
        assert r["net_revenue"] > 0
        assert abs(r["avg_qty"] - r["total_qty"] / r["n_lines"]) < 1e-9


def test_aov_trend_conserves_orders_and_revenue(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics35 import (
        q_aov_trend_monthly,
    )

    rows = q_aov_trend_monthly(spark, SF0001).collect()
    o = load(spark, SF0001, "orders")
    assert sum(r["n_orders"] for r in rows) == o.count()
    for r in rows:
        assert abs(r["avg_order_value"] - r["revenue"] / r["n_orders"]) < 1e-9
        assert r["revenue"] > 0
