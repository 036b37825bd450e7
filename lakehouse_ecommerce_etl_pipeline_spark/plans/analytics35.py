"""Analytics tier XXXV: returns and discount descriptives.

q_return_rate_monthly tracks the returned-line share per month (the
reverse-logistics KPI the l_returnflag column encodes);
q_discount_depth profiles volume and revenue by discount band (the
descriptive table behind any discount-effectiveness review —
elasticity modeling starts from exactly this grid).

Cross-engine exactness: bands are integer FLOOR of cent-scaled
discounts; every share/mean is one IEEE division of exact integers or
decimal-exact sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.operators.aggregates import (
    cents,
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


@register(
    "q_return_rate_monthly",
    oracle="""
    SELECT date_trunc('month', l_shipdate) AS month,
           COUNT(*) AS n_lines,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returned,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS return_rate
    FROM lineitem
    GROUP BY 1
    """,
)
def q_return_rate_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly return rate: the share of shipped lines flagged
    returned ('R'), per ship month — the reverse-logistics KPI
    l_returnflag exists to answer, reported as exact conditional
    counts with one IEEE division per month.

    100 TB: a single map-side-combined conditional aggregate over the
    month domain; partition pruning makes the incremental refresh
    one month's scan. Segment the same pass by part/supplier to
    localize a rising rate."""
    flag = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.date_trunc("month", "l_shipdate").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(flag).cast("bigint").alias("n_returned"),
            (
                F.sum(flag).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("return_rate"),
        )
    )


@register(
    "q_discount_depth",
    oracle=f"""
    SELECT CAST(FLOOR(l_discount * 100) AS BIGINT) AS discount_pct,
           COUNT(*) AS n_lines,
           {sql_dsum("l_quantity", "total_qty")},
           {sql_davg("l_quantity", "avg_qty")},
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                AS DOUBLE) / 10000.0 AS net_revenue
    FROM lineitem
    GROUP BY 1
    """,
)
def q_discount_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-depth profile: line volume, quantity, and net revenue
    per integer discount percent (FLOOR of the cent-scaled rate) —
    the descriptive grid a discount-effectiveness review reads first
    (does deeper discounting move more units?). Net revenue runs on
    the exact integer product lattice (DESIGN §21 rule 3): price
    snaps to cents, discount to basis points (both bare 2-dp values,
    never near a ROUND tie), and cents × (100 − bp) is an exact
    int64 in 1e-4-dollar units — no double product is ever rounded
    at a data-dependent digit, so both engines agree bit-for-bit
    regardless of their double→decimal conversion builds.

    100 TB: one map-side-combined aggregate over ~11 bands; per-band
    sums ≈ 6e18 < 2^63 even at 6e10 rows.  The elasticity regression
    (q_groupwise_regression) consumes this grid directly."""
    band = F.floor(F.col("l_discount") * 100).cast("bigint")
    net4 = cents("l_extendedprice") * (
        F.lit(100) - cents("l_discount")
    )
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy(band.alias("discount_pct"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_quantity", "total_qty"),
            davg("l_quantity", "avg_qty"),
            (F.sum(net4).cast("double") / F.lit(10000.0)).alias(
                "net_revenue"
            ),
        )
    )


@register(
    "q_aov_trend_monthly",
    oracle=f"""
    SELECT date_trunc('month', o_orderdate) AS month,
           COUNT(*) AS n_orders,
           {sql_dsum("o_totalprice", "revenue")},
           {sql_davg("o_totalprice", "avg_order_value")}
    FROM orders GROUP BY 1
    """,
)
def q_aov_trend_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly average-order-value trend: order count, decimal-exact
    revenue, and AOV (exact-sum / count) per month — the first line
    of every revenue dashboard, here as the canonical
    aggregate-then-divide shape (never avg() over raw doubles when
    the oracle must match bit-for-bit).

    100 TB: one map-side-combined aggregate over the month domain;
    month partition pruning makes the incremental refresh one
    partition's scan."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "revenue"),
            davg("o_totalprice", "avg_order_value"),
        )
    )
