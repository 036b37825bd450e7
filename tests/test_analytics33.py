from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics33 import (
    q_above_p90_customers,
    q_quartile_contingency,
    q_survival_curve,
)

SF0001 = "/root/testdata/sf0.001"


def test_survival_curve_monotone_decreasing(spark):
    rows = sorted(
        q_survival_curve(spark, SF0001).collect(),
        key=lambda r: r["horizon_days"],
    )
    assert [r["horizon_days"] for r in rows] == [7, 30, 90, 365]
    shares = [r["survival_share"] for r in rows]
    assert all(a >= b for a, b in zip(shares, shares[1:]))
    for r in rows:
        assert 0 <= r["n_surviving"] <= r["n_gaps"]


def test_quartile_contingency_margins(spark):
    rows = q_quartile_contingency(spark, SF0001).collect()
    total = sum(r["n_orders"] for r in rows)
    n_orders_with_lines = (
        load(spark, SF0001, "lineitem").select("l_orderkey").distinct().count()
    )
    assert total == n_orders_with_lines
    # each quartile margin holds ~25% of orders (ntile exactness)
    for axis in ("size_quartile", "value_quartile"):
        marg: dict[int, int] = {}
        for r in rows:
            marg[r[axis]] = marg.get(r[axis], 0) + r["n_orders"]
        assert set(marg) == {1, 2, 3, 4}
        assert max(marg.values()) - min(marg.values()) <= 1


def test_above_p90_selects_top_decile(spark):
    out = q_above_p90_customers(spark, SF0001)
    cust = load(spark, SF0001, "customer")
    per_seg = {
        r["c_mktsegment"]: r["n"]
        for r in cust.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {
        r["c_mktsegment"]: r["n"]
        for r in out.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for seg, n in per_seg.items():
        # strictly-above-p90 count is at most 10% (ties can shrink it)
        assert got.get(seg, 0) <= n - (9 * n) // 10 + 1
    assert out.filter(
        F.col("c_acctbal") <= F.col("p90_threshold")
    ).count() == 0


def test_new_vs_returning_partitions_orders(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics33 import (
        q_new_vs_returning,
    )

    rows = q_new_vs_returning(spark, SF0001).collect()
    o = load(spark, SF0001, "orders")
    assert sum(r["n_orders"] for r in rows) == o.count()
    for r in rows:
        assert r["n_new"] + r["n_returning"] == r["n_orders"]
        assert 0 <= r["new_share"] <= 1
    # every customer contributes >=1 new order (their first date)
    total_new = sum(r["n_new"] for r in rows)
    n_cust = o.select("o_custkey").distinct().count()
    assert total_new >= n_cust
