"""Datetime scalar functions.

reference: glue_jobs/orders_etl.py:75-80 — the audit/partition column
recipe every job applies: ``ingestion_timestamp = current_timestamp()``,
``order_timestamp = cast(timestamp)``, ``date = to_date(order_timestamp)``.

Determinism: ``current_timestamp`` is frozen per-query by Spark but not
reproducible across runs; ``with_audit_columns`` accepts an optional
fixed instant so tests/oracles can pin it (SURVEY.md §5 determinism
discipline).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_audit_columns(
    df: DataFrame,
    ts_col: str,
    date_col: str = "date",
    ingestion_col: str = "ingestion_timestamp",
    frozen_now: _dt.datetime | None = None,
) -> DataFrame:
    """cast → to_date → ingestion timestamp, exactly the reference's
    orders_etl.py:75-80 column derivations (pandas pre-pass at :55 is
    subsumed — final value there is also ``to_date(cast(ts))``)."""
    now = F.lit(frozen_now) if frozen_now is not None else F.current_timestamp()
    return (
        df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withColumn(date_col, F.to_date(F.col(ts_col)))
        .withColumn(ingestion_col, now)
    )
