"""Timestamp normalization for driver-generated parquet.

Lives in ``functions`` (dependency-free) so both the plans package and
the streaming modules can import it without creating an import cycle:
``streaming.* → plans._helpers → plans.__init__ → plans.analytics25 →
streaming.windows`` previously made ``import streaming.windows`` fail
unless ``plans`` was imported first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_nanos_timestamps(
    df: DataFrame, cols: tuple[str, ...] = ("ts",)
) -> DataFrame:
    """Parquet TIMESTAMP(NANOS) columns arrive as long (session sets
    ``nanosAsLong`` — Spark has no nanosecond timestamp type); convert
    to microsecond timestamps with integer division (no double
    round-trip: nano epochs exceed 2^53). Micros-encoded files read by a
    session that still infers TIMESTAMP_NTZ are coerced to session-UTC
    TIMESTAMP for the same reason (time-arithmetic functions require it)."""
    for c in cols:
        if c in df.columns and isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
        elif c in df.columns and isinstance(
            df.schema[c].dataType, T.TimestampNTZType
        ):
            df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    return df
