"""Analytics tier XXXIV: pricing governance and movement reports.

q_price_dispersion audits per-part unit-price consistency (min/max/
spread of realized unit prices — the pricing-integrity screen that
catches mispriced lines and broken discount logic); q_top_movers_wow
ranks parts by absolute week-over-week revenue change — the "movers"
report every ops review starts with, built as pre-aggregated weekly
revenue → lag → delta → deterministic top-k.

Cross-engine exactness: unit prices are IEEE divisions of identical
stored doubles (comparisons between them are same-bits-same-branch);
weekly revenues are decimal-exact; the movers ranking totals its
order with the part key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.operators.aggregates import (
    dsum,
    sql_dsum,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_MIN_LINES = 5
_TOP_N = 20


@register(
    "q_price_dispersion",
    oracle=f"""
    WITH u AS (
      SELECT l_partkey,
             l_extendedprice / l_quantity AS unit_price
      FROM lineitem WHERE l_quantity > 0
    )
    SELECT l_partkey,
           COUNT(*) AS n_lines,
           MIN(unit_price) AS min_unit_price,
           MAX(unit_price) AS max_unit_price,
           MAX(unit_price) / MIN(unit_price) AS spread_ratio
    FROM u
    GROUP BY l_partkey
    HAVING COUNT(*) >= {_MIN_LINES} AND MIN(unit_price) > 0
    """,
)
def q_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part unit-price dispersion: realized unit prices
    (extendedprice/quantity) summarized as min/max/spread ratio for
    parts with ≥{_MIN_LINES} lines — the pricing-integrity screen
    (spread ≈ 1 means consistent pricing; large spreads flag broken
    discounts or data errors). Each unit price is one IEEE division
    of identically-stored doubles, so MIN/MAX pick identical values
    on both engines and the spread divides two of them.

    100 TB: one map-side-combined aggregate on l_partkey; the HAVING
    floor prunes the long tail before any downstream join. Feed the
    flagged parts into q_rule_validation's quarantine path."""
    u = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 0)
        .select(
            "l_partkey",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_price"
            ),
        )
    )
    return (
        u.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.min("unit_price").alias("min_unit_price"),
            F.max("unit_price").alias("max_unit_price"),
            (F.max("unit_price") / F.min("unit_price")).alias(
                "spread_ratio"
            ),
        )
        .filter(
            (F.col("n_lines") >= _MIN_LINES)
            & (F.col("min_unit_price") > 0)
        )
    )


@register(
    "q_top_movers_wow",
    oracle=f"""
    WITH weekly AS (
      SELECT l_partkey, date_trunc('week', l_shipdate) AS week,
             {sql_dsum("l_extendedprice", "revenue")}
      FROM lineitem GROUP BY 1, 2
    ),
    lagged AS (
      SELECT l_partkey, week, revenue,
             LAG(revenue) OVER (PARTITION BY l_partkey
                                ORDER BY week) AS prev_revenue,
             LAG(week) OVER (PARTITION BY l_partkey
                             ORDER BY week) AS prev_week
      FROM weekly
    ),
    deltas AS (
      SELECT l_partkey, week, revenue, prev_revenue,
             revenue - prev_revenue AS delta
      FROM lagged
      WHERE prev_revenue IS NOT NULL
        AND prev_week = week - INTERVAL 7 DAY
    )
    SELECT l_partkey, week, revenue, prev_revenue, delta
    FROM deltas
    ORDER BY abs(delta) DESC, l_partkey, week
    LIMIT {_TOP_N}
    """,
)
def q_top_movers_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week top movers: parts ranked by the absolute change
    in weekly revenue between CONSECUTIVE calendar weeks (the lag is
    only a mover when the previous row really is the prior week —
    gaps don't fake deltas). Weekly revenues are decimal-exact, the
    delta subtracts two identical doubles, and the top-k order is
    totaled with (partkey, week).

    100 TB: the weekly rollup collapses facts in one shuffle; the lag
    runs per part over its few weekly rows; the global top-k is a
    TakeOrderedAndProject — no full sort ever materializes."""
    weekly = (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            "l_partkey", F.date_trunc("week", "l_shipdate").alias("week")
        )
        .agg(dsum("l_extendedprice", "revenue"))
    )
    w = Window.partitionBy("l_partkey").orderBy("week")
    lagged = weekly.select(
        "l_partkey",
        "week",
        "revenue",
        F.lag("revenue").over(w).alias("prev_revenue"),
        F.lag("week").over(w).alias("prev_week"),
    )
    deltas = lagged.filter(
        F.col("prev_revenue").isNotNull()
        & (F.col("prev_week") == F.col("week") - F.expr("INTERVAL 7 DAYS"))
    ).select(
        "l_partkey",
        "week",
        "revenue",
        "prev_revenue",
        (F.col("revenue") - F.col("prev_revenue")).alias("delta"),
    )
    return deltas.orderBy(
        F.abs(F.col("delta")).desc(), "l_partkey", "week"
    ).limit(_TOP_N)


@register(
    "q_supplier_hhi",
    oracle=f"""
    WITH sr AS (
      SELECT s.s_nationkey, l.l_suppkey,
             {sql_dsum("l.l_extendedprice", "supp_rev")}
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY s.s_nationkey, l.l_suppkey
    ),
    tot AS (
      SELECT s_nationkey,
             CAST(SUM(CAST(supp_rev AS DECIMAL(30,8))) AS DOUBLE)
               AS nation_rev,
             COUNT(*) AS n_suppliers
      FROM sr GROUP BY s_nationkey
    ),
    shares AS (
      SELECT sr.s_nationkey, tot.n_suppliers,
             sr.supp_rev / tot.nation_rev AS share
      FROM sr JOIN tot USING (s_nationkey)
    )
    SELECT s_nationkey, n_suppliers,
           CAST(CAST(SUM(CAST(floor(share * share * 1e12) AS BIGINT))
                     AS BIGINT) AS DOUBLE) / 1e12 AS hhi,
           MAX(share) AS top_share
    FROM shares
    GROUP BY s_nationkey, n_suppliers
    """,
)
def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier concentration per nation: the Herfindahl–Hirschman
    index (Σ share²) plus the single largest share — the market-
    concentration screen behind supply-risk reviews (HHI → 1 means
    one supplier owns the nation's volume). Each share divides
    identical decimal-exact revenues; each share² is floor-scaled to
    an integer picounit BEFORE the sum (the q_attribution_linear
    rule: double→decimal casts diverge at these magnitudes, floors of
    identical IEEE products cannot), so the index is associative and
    engine-exact. MAX picks among identical doubles.

    100 TB: two map-side-combined aggregates (supplier-nation, then
    nation) with a broadcast-sized supplier dimension join — the
    whole report is dimension-scale after the first collapse."""
    li = load(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sr = (
        li.join(
            F.broadcast(s), li["l_suppkey"] == s["s_suppkey"]
        )
        .groupBy("s_nationkey", "l_suppkey")
        .agg(dsum("l_extendedprice", "supp_rev"))
    )
    tot = sr.groupBy("s_nationkey").agg(
        F.sum(F.col("supp_rev").cast("decimal(30,8)"))
        .cast("double")
        .alias("nation_rev"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    shares = sr.join(F.broadcast(tot), "s_nationkey").select(
        "s_nationkey",
        "n_suppliers",
        (F.col("supp_rev") / F.col("nation_rev")).alias("share"),
    )
    return shares.groupBy("s_nationkey", "n_suppliers").agg(
        (
            F.sum(
                F.floor(F.col("share") * F.col("share") * F.lit(1e12)).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .cast("double")
            / F.lit(1e12)
        ).alias("hhi"),
        F.max("share").alias("top_share"),
    )
