"""Streaming joins: stream-static enrichment and stream-stream
interval joins, drained with availableNow so batch oracles check them.

100 TB notes: a stream-static join re-reads the static side per
micro-batch — broadcast it when dimension-sized (Spark plans it as a
broadcast join automatically under the threshold). Stream-stream
joins buffer BOTH sides in the state store; the watermark plus the
time-range join condition bound that state (rows older than
watermark - upper-bound are evicted). Without the range condition the
state grows without bound — never ship an unconstrained stream-stream
join.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.functions.timestamps import (
    normalize_nanos_timestamps,
)
from lakehouse_ecommerce_etl_pipeline_spark.streaming.windows import (
    _as_stream_dir,
    state_sized_shuffle,
)

# Exact engine-portable value sums: BIGINT integer-cents lattice
# (DESIGN §21 rule 3; events.value is 2-dp-valued, so ROUND(v*100) is
# never near a tie) — int64 partial sums stay associative across
# micro-batches and engine builds; descale once at the end.


def _events_stream(spark: SparkSession, parquet_path: str) -> DataFrame:
    schema = spark.read.parquet(parquet_path).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(_as_stream_dir(parquet_path))
    )
    return normalize_nanos_timestamps(stream, ("ts",))


def _drain(
    df: DataFrame, mode: str, prefix: str, *src_paths: str
) -> DataFrame:
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    spark = df.sparkSession
    with state_sized_shuffle(spark, *src_paths):
        q = (
            df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def stream_static_enrich_agg(
    spark: SparkSession, events_path: str, static_dim: DataFrame
) -> DataFrame:
    """Stream-static join (events stream enriched with a dimension
    table) followed by a per-segment aggregate — the streaming twin of
    the star-join + group-by. The static side joins fresh each
    micro-batch (no state), broadcast under the AQE threshold."""
    stream = _events_stream(spark, events_path)
    joined = stream.join(
        static_dim, stream["user_id"] == static_dim["c_custkey"], "inner"
    )
    agg = joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
                F.sum(F.round(F.col("value") * 100).cast("bigint")).cast(
                    "double"
                )
                / F.lit(100.0)
            ).alias("sum_value"),
    )
    return _drain(agg, "complete", "stream_enrich", events_path)


def stream_interval_join(
    spark: SparkSession,
    events_path: str,
    left_type: str = "view",
    right_type: str = "purchase",
    horizon: str = "INTERVAL 1 HOUR",
) -> DataFrame:
    """Stream-stream interval join: for every `left_type` event, the
    same user's `right_type` events within [ts, ts + horizon). Both
    sides carry watermarks and the join carries the time-range
    condition, so state is bounded; inner-join results emit eagerly,
    so one availableNow drain yields the complete batch answer."""
    left = (
        _events_stream(spark, events_path)
        .filter(F.col("event_type") == left_type)
        .select(
            F.col("user_id").alias("l_user"),
            F.col("event_id").alias("left_id"),
            F.col("ts").alias("l_ts"),
        )
        .withWatermark("l_ts", "1 hour")
    )
    right = (
        _events_stream(spark, events_path)
        .filter(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("right_id"),
            F.col("ts").alias("r_ts"),
        )
        .withWatermark("r_ts", "1 hour")
    )
    joined = left.join(
        right,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") < F.col("l_ts") + F.expr(horizon)),
        "inner",
    ).select(
        F.col("l_user").alias("user_id"),
        "left_id",
        "right_id",
        (F.unix_micros("r_ts") - F.unix_micros("l_ts")).alias("lag_micros"),
    )
    return _drain(joined, "append", "stream_ij", events_path)


def stream_interval_join_outer(
    spark: SparkSession,
    events_path: str,
    left_type: str = "view",
    right_type: str = "purchase",
    horizon: str = "INTERVAL 1 HOUR",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: like
    ``stream_interval_join``, but views with NO purchase in their
    horizon also emit — null-padded, once the watermark passes the end
    of their interval and the state store can prove no match is
    coming. That proof requirement is the semantic difference from
    batch: a view whose interval is still open when the stream ends
    (l_ts + horizon > final watermark) stays in state and never emits,
    so the batch oracle must carry the same cutoff.

    100 TB: identical state bounds to the inner variant (both sides
    buffered inside watermark + range); the outer emission adds no
    state, only an eviction-time scan — late-epoch rows held back are
    the price of correct no-match proofs."""
    left = (
        _events_stream(spark, events_path)
        .filter(F.col("event_type") == left_type)
        .select(
            F.col("user_id").alias("l_user"),
            F.col("event_id").alias("left_id"),
            F.col("ts").alias("l_ts"),
        )
        .withWatermark("l_ts", "1 hour")
    )
    right = (
        _events_stream(spark, events_path)
        .filter(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("right_id"),
            F.col("ts").alias("r_ts"),
        )
        .withWatermark("r_ts", "1 hour")
    )
    joined = left.join(
        right,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") < F.col("l_ts") + F.expr(horizon)),
        "leftOuter",
    ).select(
        F.col("l_user").alias("user_id"),
        "left_id",
        "right_id",
        (F.unix_micros("r_ts") - F.unix_micros("l_ts")).alias("lag_micros"),
    )
    return _drain(joined, "append", "stream_ij_outer", events_path)
