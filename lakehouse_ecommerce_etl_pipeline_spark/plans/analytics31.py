"""Analytics tier XXXI: operational SLA metrics.

q_shipping_sla closes the order-fulfilment loop the reference's
star schema exists to serve: per order priority, how fast line items
actually ship relative to their order date — attainment share within
the SLA window, the exact p90 ship delay, and the worst case. The
delay is an integer day difference; attainment is one IEEE division
of exact counts; the p90 is the ceil(0.9·n)-th order statistic under
a total order (the q_kth_order_statistic discipline applied to a
fact-fact join result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_SLA_DAYS = 30
_P = 0.9


@register(
    "q_shipping_sla",
    oracle=f"""
    WITH d AS (
      SELECT o.o_orderpriority,
             date_diff('day', o.o_orderdate, l.l_shipdate) AS delay_days,
             l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    r AS (
      SELECT o_orderpriority, delay_days,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY delay_days, l_orderkey, l_linenumber,
                        l_partkey, l_suppkey) AS rk,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM d
    ),
    p90 AS (
      SELECT o_orderpriority, delay_days AS p90_delay_days
      FROM r WHERE rk = CEIL({_P} * n)
    ),
    agg AS (
      SELECT o_orderpriority,
             COUNT(*) AS n_lineitems,
             CAST(COUNT(*) FILTER (WHERE delay_days <= {_SLA_DAYS})
                  AS BIGINT) AS n_within_sla,
             MAX(delay_days) AS max_delay_days
      FROM d GROUP BY o_orderpriority
    )
    SELECT a.o_orderpriority, a.n_lineitems, a.n_within_sla,
           CAST(a.n_within_sla AS DOUBLE) / CAST(a.n_lineitems AS DOUBLE)
             AS sla_attainment,
           p.p90_delay_days, a.max_delay_days
    FROM agg a JOIN p90 p USING (o_orderpriority)
    """,
)
def q_shipping_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfilment SLA by order priority: ship delay (integer days
    between order date and line ship date), attainment within
    {_SLA_DAYS} days, the exact discrete p90 delay, and the worst
    case. The p90 pick carries a full tiebreak (delay, orderkey,
    linenumber, partkey, suppkey) because lineitem holds duplicate
    (orderkey, linenumber) keys — the extra columns make the order
    total so the ceil(p·n)-th row is unique and engine-stable.

    100 TB: the fact-fact join co-partitions on l_orderkey; the
    per-priority rank is a window sort within 5 priority partitions —
    at real scale swap the rank pick for the two-phase selection
    (q_quantile_bucket_assign) exactly as q_kth_order_statistic
    documents. Attainment and max ride the same single aggregation."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_shipdate"
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate", "o_orderpriority"
    )
    d = li.join(o, "l_orderkey").select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").alias("delay_days"),
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        "delay_days", "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    r = d.select(
        "o_orderpriority",
        "delay_days",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("o_orderpriority"))
        .alias("n"),
    )
    p90 = r.filter(
        F.col("rk") == F.ceil(F.lit(_P) * F.col("n"))
    ).select("o_orderpriority", F.col("delay_days").alias("p90_delay_days"))
    agg = d.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.count_if(F.col("delay_days") <= _SLA_DAYS)
        .cast("bigint")
        .alias("n_within_sla"),
        F.max("delay_days").alias("max_delay_days"),
    )
    return agg.join(F.broadcast(p90), "o_orderpriority").select(
        "o_orderpriority",
        "n_lineitems",
        "n_within_sla",
        (
            F.col("n_within_sla").cast("double")
            / F.col("n_lineitems").cast("double")
        ).alias("sla_attainment"),
        "p90_delay_days",
        "max_delay_days",
    )
