"""TPC-H suite II: Q14, Q18, Q19 adaptations — promo share, large-
volume customers (HAVING over a fact-fact join), multi-predicate
brand/size filters."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

# Exact integer revenue TERM in 1e-4-dollar int64 units (DESIGN §21
# rule 3, see plans/tpch.py): cents × (100 − basis points), no
# double→decimal cast on either engine.  Plain revenue sums descale
# by /10000.0; ratios of two sums leave the 1e4 factors to cancel.
_REV_SQL = (
    "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"
)


def _rev_col():
    return F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint")
    )


@register(
    "q_tpch_q14_promo_share",
    oracle=f"""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                      THEN {_REV_SQL} ELSE 0 END) AS DOUBLE)
                / CAST(SUM({_REV_SQL}) AS DOUBLE) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q_tpch_q14_promo_share(spark, sf_dir):
    """TPC-H Q14 (promotion effect): conditional aggregation over a
    broadcast part join; ratio of two decimal-exact sums in double."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _rev_col()
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).cast(
                "double"
            )
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct")
    )


@register(
    "q_tpch_q18_large_volume",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    HAVING SUM(CAST(l.l_quantity AS BIGINT)) > 120
    """,
)
def q_tpch_q18_large_volume(spark, sf_dir):
    """TPC-H Q18 (large-volume customers): fact-fact join + grouped
    HAVING on an exact int64 quantity sum (l_quantity is
    integer-valued; a double→BIGINT cast of an exact integer is
    portable — DESIGN §21 rule 3)."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    qty = F.sum(F.col("l_quantity").cast("bigint"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(qty.cast("double").alias("total_qty"), qty.alias("__q"))
        .filter(F.col("__q") > 120)
        .drop("__q")
    )


@register(
    "q_tpch_q7_nation_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_0' AND cn.n_name = 'NATION_1')
        OR (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_0'))
    GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
    """,
)
def q_tpch_q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 (volume shipping between two nations): double nation
    dimension aliasing (supplier vs customer side) + yearly revenue."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
    )
    pair = (
        ((F.col("supp_nation") == "NATION_0") & (F.col("cust_nation") == "NATION_1"))
        | ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_0"))
    )
    return (
        j.filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            (F.sum(_rev_col()).cast("double") / F.lit(10000.0)).alias(
                "revenue"
            )
        )
    )


@register(
    "q_tpch_q12_late_lines",
    oracle="""
    SELECT o.o_orderpriority, COUNT(DISTINCT o.o_orderkey) AS late_orders
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE date_diff('day', CAST(o.o_orderdate AS DATE),
                    CAST(l.l_shipdate AS DATE)) > 90
    GROUP BY o.o_orderpriority
    """,
)
def q_tpch_q12_late_lines(spark, sf_dir):
    """TPC-H Q12 adapted (no shipmode/receipt columns in this schema):
    orders with lines shipped > 90 days after order date, counted per
    priority."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    j = o.join(li, o.o_orderkey == li.l_orderkey).filter(
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) > 90
    )
    return j.groupBy("o_orderpriority").agg(
        F.countDistinct("o_orderkey").alias("late_orders")
    )


@register(
    "q_tpch_q19_brand_revenue",
    oracle=f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19_brand_revenue(spark, sf_dir):
    """TPC-H Q19 (discounted revenue): disjunctive multi-predicate
    join filter — Catalyst pushes the common join key, evaluates the
    OR-of-ANDs post-join."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return j.filter(cond).agg(
        (F.sum(_rev_col()).cast("double") / F.lit(10000.0)).alias("revenue")
    )
