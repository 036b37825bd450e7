"""Analytics tier XXX: audit screens and timeline structure.

New shapes over I-XXIX: a Benford first-digit screen over order
values (the classic fraud/integrity test — observed digit shares vs
the log-law expectation, with the expectation injected as identical
literals on both engines so no cross-engine log is ever taken), a
day-of-week seasonality index (daily revenue normalized by its
weekday's average — the ratio-to-category-mean normalization), and
change-point flags on the daily revenue timeline (adjacent
before/after window means diverging beyond a relative threshold —
CUSUM-lite, windows over the pre-aggregated day domain).

Cross-engine exactness: digit extraction rides the shortest-
roundtrip string rendering both engines share; every mean/ratio is
IEEE algebra over identical inputs derived from decimal-exact sums;
thresshold decisions compare identically-derived doubles (same bits
⇒ same branch).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.operators.aggregates import (
    dsum,
    sql_dsum,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

# Benford expectation log10(1 + 1/d), computed ONCE in Python and
# injected as literals — both engines consume the identical double.
_BENFORD = {d: math.log10(1 + 1 / d) for d in range(1, 10)}

_BENFORD_CASE_SQL = (
    "CASE first_digit "
    + " ".join(f"WHEN {d} THEN {_BENFORD[d]!r}" for d in range(1, 10))
    + " END"
)


@register(
    "q_benford_first_digit",
    oracle=f"""
    WITH d AS (
      SELECT CAST(substring(CAST(o_totalprice AS VARCHAR), 1, 1) AS INTEGER)
               AS first_digit
      FROM orders WHERE o_totalprice >= 1
    ),
    c AS (
      SELECT first_digit, COUNT(*) AS n_orders FROM d GROUP BY first_digit
    ),
    t AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS total FROM c)
    SELECT first_digit, n_orders,
           CAST(n_orders AS DOUBLE) / CAST(t.total AS DOUBLE)
             AS observed_share,
           {_BENFORD_CASE_SQL} AS expected_share
    FROM c CROSS JOIN t
    """,
)
def q_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit screen on order values: observed digit
    shares against the log-law expectation — the standard financial
    integrity test (fabricated values flunk it). The first digit
    comes off the value's string rendering (shortest-roundtrip on
    both engines, and the leading digit is rendering-stable for
    values ≥ 1); the expectation log10(1+1/d) is computed once in
    Python and injected as an identical literal on both sides, so no
    engine ever evaluates a logarithm.

    100 TB: a 9-group map-side-combined count — the cheapest audit
    screen there is; run per partition/source to localize anomalies
    (a clean global histogram can hide a dirty partition)."""
    expected = F.create_map(
        *[x for d in range(1, 10) for x in (F.lit(d), F.lit(_BENFORD[d]))]
    )
    c = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 1)
        .select(
            F.substring(F.col("o_totalprice").cast("string"), 1, 1)
            .cast("int")
            .alias("first_digit")
        )
        .groupBy("first_digit")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    total = F.sum("n_orders").over(Window.partitionBy()).cast("bigint")
    return c.select(
        "first_digit",
        "n_orders",
        (F.col("n_orders").cast("double") / total.cast("double")).alias(
            "observed_share"
        ),
        expected[F.col("first_digit")].alias("expected_share"),
    )


@register(
    "q_dow_seasonality_index",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
             {sql_dsum("o_totalprice", "revenue")}
      FROM orders GROUP BY 1, 2
    ),
    m AS (
      SELECT dow,
             CAST(SUM(CAST(revenue AS DECIMAL(30,8))) AS DOUBLE)
               / COUNT(*) AS dow_avg
      FROM daily GROUP BY dow
    )
    SELECT d.day, d.dow, d.revenue, m.dow_avg,
           d.revenue / m.dow_avg AS seasonality_index
    FROM daily d JOIN m USING (dow)
    """,
)
def q_dow_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index: each day's revenue normalized by
    the average revenue of its weekday — the ratio-to-category-mean
    normalization that separates weekly rhythm from trend (index > 1:
    above-typical for that weekday). Daily revenues are decimal-exact;
    the weekday mean re-quantizes them before its division, so both
    engines divide identical doubles. (Weekday numbering: Spark's
    dayofweek is 1=Sunday, DuckDB's is 0=Sunday — the oracle shifts
    by one to the Spark convention.)

    100 TB: facts collapse to the day grain in one shuffle; the
    weekday dimension is 7 rows, broadcast back. Never compute
    category means by windowing over facts — aggregate first."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.to_date("o_orderdate").alias("day"),
            F.dayofweek("o_orderdate").cast("int").alias("dow"),
        )
        .agg(dsum("o_totalprice", "revenue"))
    )
    m = daily.groupBy("dow").agg(
        (
            F.sum(F.col("revenue").cast("decimal(30,8)")).cast("double")
            / F.count(F.lit(1))
        ).alias("dow_avg")
    )
    return daily.join(F.broadcast(m), "dow").select(
        "day",
        "dow",
        "revenue",
        "dow_avg",
        (F.col("revenue") / F.col("dow_avg")).alias("seasonality_index"),
    )


_CP_W = 3  # days on each side of the candidate change point


@register(
    "q_change_point_flags",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             {sql_dsum("o_totalprice", "revenue")}
      FROM orders GROUP BY 1
    ),
    w AS (
      SELECT day, revenue,
             AVG(revenue) OVER (ORDER BY day
                                ROWS BETWEEN {_CP_W} PRECEDING
                                         AND 1 PRECEDING) AS before_mean,
             AVG(revenue) OVER (ORDER BY day
                                ROWS BETWEEN CURRENT ROW
                                         AND {_CP_W - 1} FOLLOWING)
               AS after_mean,
             COUNT(*) OVER (ORDER BY day
                            ROWS BETWEEN {_CP_W} PRECEDING
                                     AND 1 PRECEDING) AS n_before,
             COUNT(*) OVER (ORDER BY day
                            ROWS BETWEEN CURRENT ROW
                                     AND {_CP_W - 1} FOLLOWING) AS n_after
      FROM daily
    )
    SELECT day, revenue, before_mean, after_mean
    FROM w
    WHERE n_before = {_CP_W} AND n_after = {_CP_W}
      AND abs(after_mean - before_mean) > 0.5 * before_mean
    """,
)
def q_change_point_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-point flags on the daily revenue timeline: a day is
    flagged when the mean of its {_CP_W}-day forward window diverges
    from the trailing {_CP_W}-day mean by more than 50% — CUSUM-lite,
    the alerting primitive behind revenue-drop pagers. Both window
    means average the same decimal-exact daily revenues, so the
    threshold compares identically-derived doubles on both engines
    (same bits, same branch); edge days without full windows are
    excluded rather than flagged on partial evidence.

    100 TB: the windows run over the pre-aggregated day domain
    (thousands of rows), never over facts — the unpartitioned
    ORDER BY day is safe exactly because the domain is small."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(dsum("o_totalprice", "revenue"))
    )
    before = Window.orderBy("day").rowsBetween(-_CP_W, -1)
    after = Window.orderBy("day").rowsBetween(0, _CP_W - 1)
    w = daily.select(
        "day",
        "revenue",
        F.avg("revenue").over(before).alias("before_mean"),
        F.avg("revenue").over(after).alias("after_mean"),
        F.count(F.lit(1)).over(before).alias("n_before"),
        F.count(F.lit(1)).over(after).alias("n_after"),
    )
    return w.filter(
        (F.col("n_before") == _CP_W)
        & (F.col("n_after") == _CP_W)
        & (
            F.abs(F.col("after_mean") - F.col("before_mean"))
            > 0.5 * F.col("before_mean")
        )
    ).select("day", "revenue", "before_mean", "after_mean")
