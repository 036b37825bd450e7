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
           CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                * (100 + CAST(ROUND(l_tax * 100) AS BIGINT)) AS DOUBLE)
             / 1000000.0 AS item_total
    FROM lineitem
    """,
)
def q_enrich_derived(spark, sf_dir):
    """Derived enrichment (docs:152): the TPC-H charged-amount formula
    on the exact integer lattice (DESIGN §21 rule 3): cents ×
    (100 − discount bp) × (100 + tax bp) is an exact int64 in
    1e-6-dollar units (≤ ~1.1e11 per row, exactly representable in
    double), descaled once — no decimal typing rules on either
    engine."""
    li = load(spark, sf_dir, "lineitem")
    item_total = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
        * (F.lit(100) + F.round(F.col("l_tax") * 100).cast("bigint"))
    ).cast("double") / F.lit(1000000.0)
    return with_derived(li, {"item_total": item_total}).select(
        "l_orderkey", "l_linenumber", "item_total"
    )


@register(
    "q_anomaly_zscore",
    oracle="""
    WITH stats AS (
      SELECT o_custkey,
             COUNT(o_totalprice) AS n,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS DOUBLE) / 100.0 AS s,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                      * CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS DOUBLE) / 10000.0 AS ss
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
    z-scores from exact integer-cents moments (one aggregate + broadcast
    join back — no window sort)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    flagged = zscore_outliers(o, "o_totalprice", ["o_custkey"], z_threshold=3.0)
    return flagged.filter(
        F.col("zscore").isNotNull() & ~F.isnan(F.col("zscore"))
    ).select("o_orderkey", "o_custkey", "zscore")
