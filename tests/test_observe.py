"""Observation metrics: DQ counters collected DURING the main job
(df.observe) must equal a separate aggregation pass — the zero-extra-
scan monitoring hook a 100 TB pipeline uses instead of re-reading the
table to count rejects."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load

SF0001 = "/root/testdata/sf0.001"


def test_observe_matches_separate_aggregate(spark):
    orders = load(spark, SF0001, "orders")
    obs = Observation("dq")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents).alias("total_cents"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("n_nonpositive"),
    )
    # the "main job": a write-shaped action over the observed frame
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get

    expect = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents).alias("total_cents"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("n_nonpositive"),
    ).first()
    assert got["n_rows"] == expect["n_rows"]
    assert got["total_cents"] == expect["total_cents"]
    assert got["n_nonpositive"] == expect["n_nonpositive"] == 0
