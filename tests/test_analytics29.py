from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics29 import (
    q_category_overlap,
    q_hash_partition_profile,
    q_repeat_purchase_curve,
)

SF0001 = "/root/testdata/sf0.001"


def test_partition_profile_conserves_rows(spark):
    out = q_hash_partition_profile(spark, SF0001).collect()
    assert sum(r["n_rows"] for r in out) == load(
        spark, SF0001, "lineitem"
    ).count()
    assert all(0 <= r["bucket"] < 32 for r in out)
    # md5 distributes the synthetic keyspace roughly evenly: no bucket
    # should carry more than 4x the fair share
    fair = sum(r["n_rows"] for r in out) / 32
    assert max(r["n_rows"] for r in out) < 4 * fair


def test_category_overlap_bounded_by_marginals(spark):
    out = q_category_overlap(spark, SF0001).collect()
    per_pri = {
        r["o_orderpriority"]: r["n"]
        for r in load(spark, SF0001, "orders")
        .select("o_custkey", "o_orderpriority")
        .distinct()
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert out
    for r in out:
        assert r["pri_a"] < r["pri_b"]
        assert r["n_shared_customers"] <= min(
            per_pri[r["pri_a"]], per_pri[r["pri_b"]]
        )


def test_repeat_purchase_curve_monotone_to_one(spark):
    rows = sorted(
        q_repeat_purchase_curve(spark, SF0001).collect(),
        key=lambda r: r["n_orders"],
    )
    shares = [r["cum_share"] for r in rows]
    assert all(b >= a for a, b in zip(shares, shares[1:]))
    assert abs(shares[-1] - 1.0) < 1e-12
    n_cust = (
        load(spark, SF0001, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
