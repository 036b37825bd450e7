"""Window-function operators (extension tier — SURVEY.md §2.6).

The reference has no window functions; they power (a) deterministic
dedup (operators/dedup.py), (b) ranking/top-k-per-group, (c) analytic
lag/lead (the natural derivation of the reference's
``days_since_prior_order`` column — README.md:87), and
(d) running-frame aggregates and sessionization over `events`.

100 TB: a window = shuffle on partition keys + per-partition sort.
Skewed partition keys (one user with 1e9 events) serialize into one
task — pre-filter, bucket by (key, time-range), or use streaming
``applyInPandasWithState`` for unbounded per-key state instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Window sums ride the BIGINT integer-cents lattice (DESIGN §21
# rule 3): exact int64 accumulation under any frame, one /100.0
# descale — no engine-build-sensitive double→decimal cast.


def ranked(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    alias: str = "rn",
    method: str = "row_number",
) -> DataFrame:
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[
        method
    ]
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(alias, fn().over(w))


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
) -> DataFrame:
    """Top-k rows per group; ``order_by`` must totally order each group
    for deterministic output."""
    return ranked(df, partition_by, order_by, "__rn").filter(
        F.col("__rn") <= k
    ).drop("__rn")


def with_lag(
    df: DataFrame,
    col: str,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    offset: int = 1,
    alias: str | None = None,
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(alias or f"{col}_lag{offset}", F.lag(col, offset).over(w))


def running_sum(
    df: DataFrame,
    col: str,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    alias: str = "running_sum",
) -> DataFrame:
    """Cumulative sum (unbounded preceding → current row). Routed
    through decimal for engine-portable exactness (see aggregates.py)."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        alias,
        F.sum(F.round(F.col(col) * 100).cast("bigint")).over(w).cast("double")
        / F.lit(100.0),
    )


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: Sequence[str] = (),
    session_col: str = "session_id",
) -> DataFrame:
    """Assign session ids per user: a new session starts when the gap
    from the previous event exceeds ``gap_seconds``.

    Classic lag + cumulative-sum-of-boundaries composition; for
    streaming use ``session_window`` (streaming/windows.py).
    """
    order = [F.col(ts_col), *[F.col(c) for c in order_tiebreak]]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    is_new = (
        prev_ts.isNull()
        | (F.col(ts_col).cast("long") - prev_ts.cast("long") > gap_seconds)
    ).cast("long")
    return df.withColumn(session_col, F.sum(is_new).over(w))
