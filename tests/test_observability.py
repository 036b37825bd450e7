"""Observation metrics + parameterized SQL — the operability surface
a production pipeline wires around every job: data-quality counters
that piggyback on the main action (no second scan), and named-
parameter SQL (injection-safe, plan-cache-friendly templating)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load

SF0001 = "/root/testdata/sf0.001"


def test_observe_metrics_piggyback_on_action(spark):
    li = load(spark, SF0001, "lineitem")
    obs = Observation("dq")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").isNull().cast("int")).alias("n_null_qty"),
        F.min("l_shipdate").alias("min_ship"),
    )
    # one action drives BOTH the business result and the DQ counters
    n_flags = observed.select("l_returnflag").distinct().count()
    assert n_flags == 3
    got = obs.get
    assert got["n_rows"] == li.count()
    assert got["n_null_qty"] == 0
    assert got["min_ship"] is not None


def test_parameterized_sql_named_args(spark):
    load(spark, SF0001, "orders").createOrReplaceTempView("obs_orders")
    df = spark.sql(
        "SELECT COUNT(*) AS n FROM obs_orders "
        "WHERE o_totalprice > :lo AND o_orderpriority = :prio",
        args={"lo": 100000.0, "prio": "1-URGENT"},
    )
    want = (
        load(spark, SF0001, "orders")
        .filter(
            (F.col("o_totalprice") > 100000.0)
            & (F.col("o_orderpriority") == "1-URGENT")
        )
        .count()
    )
    assert df.first()["n"] == want
