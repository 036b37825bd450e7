"""Analytical tier V: remaining window analytics (lead/ntile/
percent_rank/first_value), ordered string aggregation, deterministic
argmax."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


@register(
    "q_window_analytics",
    oracle="""
    SELECT o_orderkey, o_custkey,
           LEAD(o_orderkey) OVER w AS next_orderkey,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           FIRST_VALUE(o_orderkey) OVER w AS first_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_analytics(spark, sf_dir):
    """Analytic-window battery: lead, ntile, percent_rank, first_value
    over a totally-ordered per-customer window."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
    )


@register(
    "q_string_agg",
    oracle="""
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
             AS priorities
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_string_agg(spark, sf_dir):
    """Ordered string aggregation (listagg): sorted-distinct collect +
    join — deterministic on both engines via explicit ordering."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("o_orderpriority")), ","
            ).alias("priorities")
        )
    )


@register(
    "q_argmax",
    oracle="""
    SELECT o_orderstatus, o_orderkey AS top_orderkey, o_totalprice AS top_price
    FROM (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn = 1
    """,
)
def q_argmax(spark, sf_dir):
    """Deterministic argmax per group via lexicographic struct max —
    one hash aggregate (map-side combinable), no window sort. Ties on
    price break toward the smaller key ((price, -key) max ≡ (price
    desc, key asc) first)."""
    o = load(spark, sf_dir, "orders")
    best = (
        o.groupBy("o_orderstatus")
        .agg(
            F.max(
                F.struct(
                    F.col("o_totalprice"), (-F.col("o_orderkey")).alias("neg_key")
                )
            ).alias("b")
        )
    )
    return best.select(
        "o_orderstatus",
        (-F.col("b.neg_key")).alias("top_orderkey"),
        F.col("b.o_totalprice").alias("top_price"),
    )
