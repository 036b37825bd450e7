"""Queries for the documented-but-absent reference operators
(SURVEY.md §2.13): rule validation, enrichment, anomaly flagging."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.operators.rules import (
    apply_rules,
    positive_amount_rule,
    timestamp_range_rule,
    with_derived,
    zscore_outliers,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


@register(
    "q_rule_validation",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate,
           CASE
             WHEN NOT coalesce(
               o_orderdate BETWEEN TIMESTAMP '1992-01-01 00:00:00'
                               AND TIMESTAMP '1998-12-31 23:59:59', FALSE)
               THEN 'o_orderdate outside [1992-01-01 00:00:00, 1998-12-31 23:59:59]'
             WHEN NOT coalesce(o_totalprice > 100.0, FALSE)
               THEN 'o_totalprice not positive-enough'
           END AS rejection_reason
    FROM orders
    WHERE NOT (coalesce(o_orderdate BETWEEN TIMESTAMP '1992-01-01 00:00:00'
                                        AND TIMESTAMP '1998-12-31 23:59:59', FALSE)
               AND coalesce(o_totalprice > 100.0, FALSE))
    """,
)
def q_rule_validation(spark, sf_dir):
    """Rule-based validation (docs:142-143): timestamp-range + amount
    threshold; rejects carry the first violated rule's reason. The
    threshold is set to 100.0 so the query has non-trivial output on
    clean TPC-H data."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    rules = [
        timestamp_range_rule("o_orderdate", "1992-01-01 00:00:00", "1998-12-31 23:59:59"),
        positive_amount_rule("o_totalprice"),
    ]
    rules[1].predicate = F.col("o_totalprice") > 100.0
    rules[1].reason = "o_totalprice not positive-enough"
    _, invalid = apply_rules(o, rules)
    return invalid


@register(
    "q_enrich_derived",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))
                * (1 + CAST(l_tax AS DECIMAL(4,2))) AS DOUBLE) AS item_total
    FROM lineitem
    """,
)
def q_enrich_derived(spark, sf_dir):
    """Derived enrichment (docs:152): the TPC-H charged-amount formula
    as an exact decimal computation. Input precisions are sized to the
    data (prices 2 dp, rates 2 dp) so the 3-factor product stays under
    DECIMAL(38) — oversized casts overflow precision and trigger
    Spark's silent scale reduction, which diverges from other engines."""
    li = load(spark, sf_dir, "lineitem")
    item_total = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
        * (F.lit(1) + F.col("l_tax").cast("decimal(4,2)"))
    ).cast("double")
    return with_derived(li, {"item_total": item_total}).select(
        "l_orderkey", "l_linenumber", "item_total"
    )


@register(
    "q_anomaly_zscore",
    oracle="""
    WITH stats AS (
      SELECT o_custkey,
             COUNT(o_totalprice) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS s,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))
                      * CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS ss
      FROM orders GROUP BY o_custkey
    )
    SELECT o.o_orderkey, o.o_custkey,
           ROUND((o.o_totalprice - s / n) / sqrt((ss - s * s / n) / (n - 1)), 6)
             AS zscore
    FROM orders o JOIN stats USING (o_custkey)
    WHERE n > 1 AND (ss - s * s / n) / (n - 1) > 0
    """,
)
def q_anomaly_zscore(spark, sf_dir):
    """Anomaly detection on ordering behavior (docs:153): per-customer
    z-scores from decimal-exact moments (one aggregate + broadcast
    join back — no window sort)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    flagged = zscore_outliers(o, "o_totalprice", ["o_custkey"], z_threshold=3.0)
    return flagged.filter(
        F.col("zscore").isNotNull() & ~F.isnan(F.col("zscore"))
    ).select("o_orderkey", "o_custkey", "zscore")
