from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics27 import (
    q_date_spine_zero_fill,
    q_from_csv_parse,
    q_try_arithmetic,
)

SF0001 = "/root/testdata/sf0.001"


def test_try_arithmetic_nulls_exactly_where_guarded(spark):
    out = q_try_arithmetic(spark, SF0001)
    # every 10th orderkey divides by zero -> NULL; others non-null
    bad = out.filter(
        (F.col("o_orderkey") % 10 == 0) & F.col("safe_ratio").isNotNull()
    )
    assert bad.count() == 0
    good = out.filter(
        (F.col("o_orderkey") % 10 != 0) & F.col("safe_ratio").isNull()
    )
    assert good.count() == 0
    # statuses are letters in this corpus -> try_cast always NULL
    assert out.filter(F.col("status_as_number").isNotNull()).count() == 0


def test_from_csv_roundtrips_values(spark):
    out = q_from_csv_parse(spark, SF0001)
    o = load(spark, SF0001, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status0"),
        F.col("o_totalprice").alias("price0"),
    )
    j = out.join(o, "o_orderkey")
    assert j.filter(F.col("k") != F.col("o_orderkey")).count() == 0
    assert j.filter(F.col("status") != F.col("status0")).count() == 0
    # shortest-roundtrip string -> double is lossless
    assert j.filter(F.col("price") != F.col("price0")).count() == 0


def test_date_spine_dense_and_conserving(spark):
    out = q_date_spine_zero_fill(spark, SF0001)
    rows = sorted(r["day"] for r in out.collect())
    # dense: every consecutive day present exactly once
    assert len(rows) == (rows[-1] - rows[0]).days + 1
    assert len(set(rows)) == len(rows)
    o = load(spark, SF0001, "orders")
    assert (
        out.agg(F.sum("n_orders")).collect()[0][0] == o.count()
    )
    zero_days = out.filter(F.col("n_orders") == 0)
    assert zero_days.filter(F.col("revenue") != 0.0).count() == 0
