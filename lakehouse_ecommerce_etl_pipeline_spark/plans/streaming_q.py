"""Streaming-tier queries — real readStream queries drained with
availableNow so the driver can check them like batch queries."""

from __future__ import annotations

from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register
from lakehouse_ecommerce_etl_pipeline_spark.streaming.windows import (
    stream_dedup,
    tumbling_agg_stream,
)


@register(
    "q_stream_tumbling_agg",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS sum_value
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
)
def q_stream_tumbling_agg(spark, sf_dir):
    """Structured Streaming tumbling-window aggregation (watermark +
    window + decimal-exact sum), drained via availableNow. Checked
    against the BATCH oracle — stream/batch parity is the test."""
    return tumbling_agg_stream(spark, f"{sf_dir}/events.parquet")


@register("q_stream_dedup")  # rows-only: state-dependent row acceptance
def q_stream_dedup(spark, sf_dir):
    """Streaming dedup with bounded state
    (dropDuplicatesWithinWatermark on event_id)."""
    return stream_dedup(spark, f"{sf_dir}/events.parquet", ["event_id"])
