"""Watermark late-data semantics: events arriving below the watermark
must be DROPPED from append-mode windowed aggregation — the property
that bounds streaming state at 100 TB (without it, every window stays
open forever waiting for stragglers).

The test uses two availableNow RUNS sharing one checkpoint (the
incremental-load pattern): a single availableNow run plans all its
batches up front, so the watermark a planned batch applies is the one
recorded at planning time — late rows in the same run slip through.
Across runs the watermark persists in the checkpoint's commit log and
the second run's input is filtered against it. That distinction is
itself the behavior under test."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
    ]
)


def _write(spark, path: str, rows, mtime: float) -> None:
    """One flat parquet FILE at `path` (the file stream source does
    not recurse into per-write directories)."""
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["ts", "user_id"]), schema=SCHEMA
    )
    stage = path + ".stage"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(
        f for f in os.listdir(stage)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    os.replace(os.path.join(stage, part), path)
    os.utime(path, (mtime, mtime))


def _drain(spark, src: str, ckpt: str, name: str) -> dict:
    # foreachBatch: the memory sink refuses checkpoint recovery, and
    # recovery across runs is exactly what this test exercises
    emitted: list = []

    def sink(batch_df, _bid: int) -> None:
        emitted.extend(batch_df.collect())

    q = (
        spark.readStream.schema(SCHEMA)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {r["w"]["start"]: r["n"] for r in emitted}


def test_late_rows_below_watermark_are_dropped_across_runs(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    t0 = pd.Timestamp("2025-04-01 10:00:00")
    now = time.time()

    # run 1: 10:00-10:59 activity -> watermark commits at 10:49 and the
    # flush batch emits the one window fully below it
    _write(
        spark,
        os.path.join(src, "f1.parquet"),
        [(t0 + pd.Timedelta(minutes=m), m) for m in (0, 15, 35, 59)],
        now - 100,
    )
    run1 = _drain(spark, src, ckpt, "late_run1")
    assert run1 == {t0.to_pydatetime(): 2}

    # run 2: one fresh row (11:30) + one LATE row (09:00, below the
    # persisted 10:49 watermark -> must be dropped, its window must
    # never materialize)
    _write(
        spark,
        os.path.join(src, "f2.parquet"),
        [
            (t0 + pd.Timedelta(minutes=90), 90),
            (t0 - pd.Timedelta(minutes=60), 999),
        ],
        now - 50,
    )
    run2 = _drain(spark, src, ckpt, "late_run2")

    # late row dropped: no window before 10:00 ever appears
    assert all(ws >= t0.to_pydatetime() for ws in run2)
    # watermark advanced to 11:20 -> the [10:30, 11:00) window closes
    # with exactly its on-time rows
    assert run2[(t0 + pd.Timedelta(minutes=30)).to_pydatetime()] == 2
    # the 11:30 row's window (end 12:00 > 11:20) stays open
    assert (t0 + pd.Timedelta(minutes=90)).to_pydatetime() not in run2
