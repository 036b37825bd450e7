from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics30 import (
    q_benford_first_digit,
    q_change_point_flags,
    q_dow_seasonality_index,
)

SF0001 = "/root/testdata/sf0.001"


def test_benford_shares_sum_to_one_and_expectations_are_loglaw(spark):
    rows = q_benford_first_digit(spark, SF0001).collect()
    assert {r["first_digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["observed_share"] for r in rows) - 1.0) < 1e-12
    for r in rows:
        assert r["expected_share"] == math.log10(1 + 1 / r["first_digit"])


def test_seasonality_index_averages_to_one_per_weekday(spark):
    rows = q_dow_seasonality_index(spark, SF0001).collect()
    by_dow: dict[int, list[float]] = {}
    for r in rows:
        by_dow.setdefault(r["dow"], []).append(r["seasonality_index"])
        assert r["seasonality_index"] > 0
    for dow, idxs in by_dow.items():
        assert abs(sum(idxs) / len(idxs) - 1.0) < 1e-9, dow


def test_change_points_actually_diverge(spark):
    rows = q_change_point_flags(spark, SF0001).collect()
    for r in rows:
        assert abs(r["after_mean"] - r["before_mean"]) > 0.5 * r["before_mean"]
    # flags are a subset of the day domain
    n_days = (
        load(spark, SF0001, "orders")
        .select(F.to_date("o_orderdate"))
        .distinct()
        .count()
    )
    assert len(rows) < n_days
