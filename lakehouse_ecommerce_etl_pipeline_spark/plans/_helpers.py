"""Shared helpers for the query corpus."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_nanos_timestamps(df: DataFrame, cols: tuple[str, ...] = ("ts",)) -> DataFrame:
    """Parquet TIMESTAMP(NANOS) columns arrive as long (session sets
    ``nanosAsLong`` — Spark has no nanosecond timestamp type); convert
    to microsecond timestamps with integer division (no double
    round-trip: nano epochs exceed 2^53)."""
    for c in cols:
        if c in df.columns and isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_nanos_timestamps(df)
    return df


def work_dir(sf_dir: str, *parts: str) -> str:
    """A deterministic scratch dir per scale factor for queries that
    must materialize inputs (CSV scan, workbooks, managed tables)."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    d = os.path.join("/tmp", "lakehouse_spark_work", tag, *parts)
    os.makedirs(d, exist_ok=True)
    return d
