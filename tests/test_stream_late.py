from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.streaming_q import (
    q_stream_late_drop,
)
from lakehouse_ecommerce_etl_pipeline_spark.streaming.late import (
    DEFER_FROM,
    T1,
    arrival_batch_col,
)

SF0001 = "/root/testdata/sf0.001"


def test_late_rows_are_genuinely_dropped(spark):
    """The emitted totals must be STRICTLY between 'drop all stragglers'
    and 'keep everything' — i.e. the watermark really dropped some
    two-batch-late rows and really admitted others."""
    emitted = q_stream_late_drop(spark, SF0001).agg(
        F.sum("n_kept").alias("n")
    ).first()["n"]

    ev = load(spark, SF0001, "events").select("event_id", "ts")
    total = ev.count()
    ev = ev.withColumn("b", arrival_batch_col())

    # windows withheld in state at stream end (never finalized)
    fw = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 3 DAY")).alias("f")
    ).first()["f"]
    withheld = ev.filter(
        F.expr("date_trunc('day', ts) + INTERVAL 1 DAY") > F.lit(fw)
    ).count()

    stragglers = ev.filter(
        (F.col("ts") >= DEFER_FROM) & (F.col("ts") < T1) & (F.col("b") == 2)
    ).count()

    assert stragglers > 0 and withheld > 0
    # strictly fewer than keep-everything: some stragglers dropped
    assert emitted < total - withheld
    # strictly more than drop-every-straggler: late-but-within-window
    # stragglers were admitted
    assert emitted > total - withheld - stragglers


def test_dropped_windows_are_exactly_the_expired_ones(spark):
    """Per-window check: only straggler windows whose WINDOW END is at
    or below (max ts of batch 0) - 3 days lose rows; every other
    emitted window carries its full batch count."""
    got = {
        r["window_start"]: r["n_kept"]
        for r in q_stream_late_drop(spark, SF0001).collect()
    }
    ev = load(spark, SF0001, "events").select("event_id", "ts")
    ev = ev.withColumn("b", arrival_batch_col())
    m0 = ev.filter(F.col("b") == 0).agg(F.max("ts")).first()[0]
    import datetime as dt

    wm = m0 - dt.timedelta(days=3)
    full = {
        r["w"]: r["n"]
        for r in ev.groupBy(F.date_trunc("day", "ts").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    kept_rows = ev.filter(
        (F.col("b") < 2)
        | (F.expr("date_trunc('day', ts) + INTERVAL 1 DAY") > F.lit(wm))
    )
    modeled = {
        r["w"]: r["n"]
        for r in kept_rows.groupBy(F.date_trunc("day", "ts").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for w, n in got.items():
        assert n == modeled[w], (w, n, modeled[w], full.get(w))
    # at least one emitted window differs from the raw batch count
    assert any(got[w] != full[w] for w in got)
