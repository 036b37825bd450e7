from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.streaming.stateful import (
    running_user_totals_stream,
)

SF = "/root/testdata/sf0.001"


def test_stateful_totals_match_batch(spark):
    streamed = running_user_totals_stream(spark, f"{SF}/events.parquet")
    # update-mode may emit a row per micro-batch; last emission per user
    # is the final state — with a single batch there is exactly one
    final = {r.user_id: (r.n_events, round(r.sum_value, 6)) for r in streamed.collect()}
    batch = {
        r.user_id: (r.n, round(r.s, 6))
        for r in load(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert final == batch
