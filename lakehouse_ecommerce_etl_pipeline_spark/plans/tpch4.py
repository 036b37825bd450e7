"""TPC-H suite IV: Q16/Q20/Q21 adapted to the reduced schema (no
partsupp, no l_commitdate/l_receiptdate). With suites I-III this
completes coverage of every TPC-H query shape expressible on the
driver's star schema: multi-column distinct counts, nested semi-join
chains, and EXISTS/NOT-EXISTS correlated pairs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


@register(
    "q_tpch_q16_supplier_count",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q_tpch_q16_supplier_count(spark, sf_dir):
    """TPC-H Q16 adapted (no partsupp → suppliers observed shipping
    the part in lineitem): distinct supplier count per surviving
    (brand, type, size) after NOT-IN style exclusions.

    Scale: the part filter broadcasts; COUNT(DISTINCT) expands to a
    two-phase aggregate (distinct on group+suppkey, then count) —
    both phases share the same shuffle key prefix.
    """
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand"),
            F.col("p_type"),
            F.col("p_size"),
        )
    )


@register(
    "q_tpch_q20_heavy_shippers",
    oracle="""
    WITH shipped AS (
      SELECT l.l_suppkey,
             SUM(CAST(l.l_quantity AS BIGINT)) AS qty
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_name LIKE 'red%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l.l_suppkey
      HAVING SUM(CAST(l.l_quantity AS BIGINT)) > 50
    )
    SELECT s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_regionkey = 1
      AND EXISTS (SELECT 1 FROM shipped WHERE shipped.l_suppkey = s.s_suppkey)
    ORDER BY s.s_name
    """,
)
def q_tpch_q20_heavy_shippers(spark, sf_dir):
    """TPC-H Q20 adapted (no partsupp availqty → "shipped more than
    50 units of red parts in 1997"): AMERICA suppliers selected by a
    semi-join against an aggregated, HAVING-filtered subquery — the
    nested semi-join-chain shape of the original.

    Scale: the aggregate runs on the filtered fact slice only
    (predicate + broadcast part filter push into the scan); the semi
    join is against a tiny grouped frame → broadcast.
    """
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    s = load(spark, sf_dir, "supplier")
    n = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 1)
        .select("n_nationkey", "n_name")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(shipped), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )


@register(
    "q_tpch_q21_sole_late_supplier",
    oracle="""
    WITH li AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS is_late
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    ), per AS (
      SELECT l_orderkey, l_suppkey, MAX(is_late) AS late
      FROM li GROUP BY l_orderkey, l_suppkey
    ), flagged AS (
      SELECT l_orderkey, l_suppkey, late,
             COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
             SUM(late) OVER (PARTITION BY l_orderkey) AS n_late
      FROM per
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM flagged f
    JOIN supplier s ON f.l_suppkey = s.s_suppkey
    WHERE f.late = 1 AND f.n_supp > 1 AND f.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q_tpch_q21_sole_late_supplier(spark, sf_dir):
    """TPC-H Q21 adapted (no l_receiptdate/l_commitdate → "late" =
    shipped more than 60 days after the order date): suppliers who
    were the SOLE late supplier on a multi-supplier finalized order.
    The original's EXISTS (another supplier) / NOT EXISTS (another
    late supplier) pair decorrelates into two window aggregates over
    the per-(order, supplier) lateness frame.

    Scale: one shuffle to (orderkey, suppkey), and the windows reuse
    the orderkey partitioning; no self-joins of the fact table.
    """
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lateness = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .withColumn(
            "is_late",
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("is_late").alias("late"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey")
    flagged = lateness.withColumn("n_supp", F.count(F.lit(1)).over(w)).withColumn(
        "n_late", F.sum("late").over(w)
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        flagged.filter(
            (F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
    )
