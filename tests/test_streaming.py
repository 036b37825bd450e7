from __future__ import annotations

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.streaming.windows import (
    stream_dedup,
    tumbling_agg_stream,
)

SF = "/root/testdata/sf0.001"


def test_stream_batch_parity_tumbling_agg(spark):
    """The availableNow stream must produce exactly the batch plan's
    result (stream/batch parity is the guarantee)."""
    from pyspark.sql import functions as F

    streamed = tumbling_agg_stream(spark, f"{SF}/events.parquet")
    batch = (
        load(spark, SF, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,8)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    s = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert s == b


def test_stream_dedup_preserves_distinct_keys(spark):
    out = stream_dedup(spark, f"{SF}/events.parquet", ["event_id"])
    n_distinct = load(spark, SF, "events").select("event_id").distinct().count()
    assert out.count() == n_distinct


def test_transform_with_state_parity_or_fallback(spark):
    """q_stream_transform_with_state equals the batch group-by on
    whichever stateful API the environment supports (ValueState
    transformWithState where protobuf exists, applyInPandasWithState
    otherwise — the gate decides, the semantics must not change)."""
    from lakehouse_ecommerce_etl_pipeline_spark.streaming.stateful import (
        running_user_totals_stream,
        running_user_totals_tws,
        transform_with_state_available,
    )

    fn = (
        running_user_totals_tws
        if transform_with_state_available()
        else running_user_totals_stream
    )
    out = fn(spark, f"{SF}/events.parquet")
    got = {(r.user_id, r.n_events, round(r.sum_value, 2)) for r in out.collect()}
    from pyspark.sql import functions as F

    batch = (
        load(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
        )
    )
    want = {(r.user_id, r.n, round(r.s, 2)) for r in batch.collect()}
    assert got == want


def test_state_sized_shuffle_sizes_and_restores(spark):
    """r13: stateful drains size shuffle partitions to the stream's
    input bytes (state partitioning cannot be AQE-coalesced) and must
    restore the session conf afterwards — including on error."""
    import os

    import pytest

    from lakehouse_ecommerce_etl_pipeline_spark.streaming.windows import (
        state_sized_shuffle,
    )

    src = f"{SF}/events.parquet"
    before = spark.conf.get("spark.sql.shuffle.partitions")
    with state_sized_shuffle(spark, src):
        inside = int(spark.conf.get("spark.sql.shuffle.partitions"))
        # tiny source → the floor of 2; never above defaultParallelism
        assert 2 <= inside <= spark.sparkContext.defaultParallelism
        expected = max(2, os.path.getsize(src) // (8 << 20))
        assert inside == min(
            expected, spark.sparkContext.defaultParallelism
        )
    assert spark.conf.get("spark.sql.shuffle.partitions") == before

    with pytest.raises(RuntimeError):
        with state_sized_shuffle(spark, src):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == before

    # explicit production override wins
    os.environ["SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS"] = "7"
    try:
        with state_sized_shuffle(spark, src):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
    finally:
        del os.environ["SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS"]
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
