"""Custom stateful streaming operator: per-key running aggregates via
``applyInPandasWithState`` — the escape hatch for stream semantics the
built-in operators can't express (arbitrary per-key state machines).

100 TB notes: state lives in the state store keyed by the group — it
shards with the shuffle, so per-key state must stay bounded (here:
two numbers per user). Use watermark-driven timeouts to expire idle
keys in unbounded-key domains; with at-least-once sources pair with
``dropDuplicatesWithinWatermark`` upstream.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import (
    normalize_nanos_timestamps,
)
from lakehouse_ecommerce_etl_pipeline_spark.streaming.windows import _as_stream_dir

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})


def running_user_totals_stream(
    spark: SparkSession, parquet_path: str
) -> DataFrame:
    """Running (count, sum) per user maintained in the state store,
    drained with availableNow. With a single micro-batch this equals
    the batch groupBy — the parity property the test asserts."""
    schema = spark.read.parquet(parquet_path).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(_as_stream_dir(parquet_path))
    )
    stream = normalize_nanos_timestamps(stream)
    totals = stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    q = (
        totals.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
