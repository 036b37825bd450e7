"""TPC-H suite III: Q2/Q8/Q9/Q11/Q13/Q15/Q17/Q22 adapted to the
reduced star schema (no partsupp, no l_commitdate/l_receiptdate —
substitutions documented per query).

Analytical-zone coverage the reference serves via Athena
(README.md:30, step_functions/lakehouse_etl_stepfunction.json:218)
but never implements; decimal-exact aggregation per the parity
cookbook (operators/aggregates.py).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

# Exact integer revenue TERM in 1e-4-dollar int64 units (DESIGN §21
# rule 3, see plans/tpch.py): no double→decimal cast on either engine.
_REV_SQL = (
    "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"
)


def _rev_col():
    return F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint")
    )


@register(
    "q_tpch_q2_min_acctbal_supplier",
    oracle="""
    WITH shipped AS (
      SELECT DISTINCT l.l_partkey, l.l_suppkey
      FROM lineitem l
    ), ranked AS (
      SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name,
             ROW_NUMBER() OVER (
               PARTITION BY p.p_partkey
               ORDER BY s.s_acctbal ASC, s.s_suppkey ASC
             ) AS rn
      FROM shipped sh
      JOIN part p ON sh.l_partkey = p.p_partkey
      JOIN supplier s ON sh.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_size = 25 AND p.p_type = 'LARGE'
        AND n.n_regionkey = 3
    )
    SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
    FROM ranked WHERE rn = 1
    """,
)
def q_tpch_q2_min_acctbal_supplier(spark, sf_dir):
    """TPC-H Q2 adapted (no partsupp → suppliers that actually shipped
    the part, ``s_acctbal`` standing in for ``ps_supplycost``): per
    part of a given size/type, the EUROPE supplier with minimum
    account balance. Argmin via window rank with total-order tiebreak.

    Scale: the distinct (partkey, suppkey) projection shuffles only
    two long columns; part/supplier/nation are broadcast dims.
    """
    shipped = (
        load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    p = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_size") == 25) & (F.col("p_type") == "LARGE"))
        .select("p_partkey", "p_name")
    )
    n = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 3)
        .select("n_nationkey", "n_name")
    )
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    joined = (
        shipped.join(F.broadcast(p), shipped.l_partkey == p.p_partkey)
        .join(F.broadcast(s), shipped.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("s_acctbal").asc(), F.col("s_suppkey").asc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )


@register(
    "q_tpch_q8_market_share",
    oracle=f"""
    SELECT CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
           CAST(CAST(SUM(CASE WHEN sn.n_name = 'NATION_7' THEN {_REV_SQL}
                              ELSE 0 END) AS DOUBLE)
                / CAST(SUM({_REV_SQL}) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE cn.n_regionkey = 2
      AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY YEAR(o.o_orderdate)
    ORDER BY o_year
    """,
)
def q_tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8 (national market share): NATION_7's share of ASIA
    ECONOMY-part revenue per year. Seven-table star join — every
    dimension broadcast, the two facts (lineitem⋈orders) shuffle once
    on orderkey; conditional decimal sums ratioed in double.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cn = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_nationkey"), F.col("n_name").alias("sn_name")
    )
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    rev = _rev_col()
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == cn.n_nationkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == sn.sn_nationkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("sn_name") == "NATION_7", rev).otherwise(F.lit(0))
                ).cast("double")
                / F.sum(rev).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q_tpch_q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation, CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
                    - CAST(ROUND(p.p_retailprice * 100) AS BIGINT)
                      * 100 * CAST(l.l_quantity AS BIGINT)) AS DOUBLE)
             / 10000.0 AS sum_profit
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, YEAR(o.o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)
def q_tpch_q9_product_profit(spark, sf_dir):
    """TPC-H Q9 adapted (no partsupp → ``p_retailprice`` stands in for
    ``ps_supplycost``): profit on red parts by supplier nation and
    year. Both product terms run on the exact 1e-4-dollar int64
    lattice (cents × basis-points and cents × 100 × integer
    quantity, DESIGN §21 rule 3) — no decimal typing rules, no
    engine-build-sensitive double→decimal casts.
    """
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("red"))
        .select("p_partkey", "p_retailprice")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = _rev_col() - (
        F.round(F.col("p_retailprice") * 100).cast("bigint")
        * F.lit(100)
        * F.col("l_quantity").cast("bigint")
    )
    joined = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            (F.sum(profit).cast("double") / F.lit(10000.0)).alias(
                "sum_profit"
            )
        )
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@register(
    "q_tpch_q11_important_value_share",
    oracle=f"""
    WITH per_nation AS (
      SELECT n.n_name, SUM({_REV_SQL}) AS val
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY n.n_name
    )
    SELECT n_name, CAST(val AS DOUBLE) / 10000.0 AS value
    FROM per_nation
    WHERE val * 25 > (SELECT SUM(val) FROM per_nation)
    ORDER BY value DESC, n_name
    """,
)
def q_tpch_q11_important_value_share(spark, sf_dir):
    """TPC-H Q11 adapted (no partsupp → shipped revenue by supplier
    nation standing in for stock value by part): nations holding more
    than 4 % of global value. The 0.04 fraction is applied as
    ``val * 25 > total`` so the comparison stays in EXACT decimal
    arithmetic on both engines — no float threshold drift.

    Scale: one shuffle to the nation grain (25 groups); the global
    total re-aggregates those 25 rows, not the fact table.
    """
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_nation = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(_rev_col()).alias("val"))
    )
    total = per_nation.agg(F.sum("val").alias("total"))
    return (
        per_nation.crossJoin(F.broadcast(total))
        .filter(F.col("val") * 25 > F.col("total"))
        .select(
            "n_name",
            (F.col("val").cast("double") / F.lit(10000.0)).alias("value"),
        )
        .orderBy(F.col("value").desc(), F.col("n_name"))
    )


@register(
    "q_tpch_q13_customer_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 (customer order-count distribution): left outer join
    with an extra join-side predicate (non-urgent orders), COUNT of
    the nullable side, then a second aggregation over the counts.
    Customers with zero qualifying orders land in the c_count=0
    bucket — the left join is load-bearing.

    Scale: first agg shuffles on custkey (high cardinality), second
    input is one row per customer count value — negligible.
    """
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q_tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l.l_suppkey AS supplier_no, SUM({_REV_SQL}) AS total_revenue
      FROM lineitem l
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l.l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) / 10000.0 AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q_tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, keep
    the max via scalar-subquery equality. The tie comparison runs on
    exact int64 1e-4-dollar sums (not doubles), so ``= MAX(...)`` is
    safe cross-engine; only the output column degrades to double.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_col()).alias("total_revenue")
    )
    best = revenue.agg(F.max("total_revenue").alias("best"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("best"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_revenue").cast("double") / F.lit(10000.0)).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q_tpch_q17_small_quantity_revenue",
    oracle="""
    WITH li AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_brand = 'Brand#13'
    ), stats AS (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
             COUNT(*) AS cnt
      FROM li GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(ROUND(li.l_extendedprice * 100) AS BIGINT))
                     AS DOUBLE) / 100.0
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM li JOIN stats ON li.l_partkey = stats.l_partkey
    WHERE CAST(li.l_quantity AS BIGINT) * 5 * stats.cnt < stats.sum_qty
    """,
)
def q_tpch_q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): lineitems below 20 %
    of their part's average quantity. The correlated AVG subquery is
    decorrelated into a window aggregate, and the float threshold
    ``qty < 0.2 * avg`` is algebraically rewritten to
    ``qty * 5 * cnt < sum_qty`` — pure int64 arithmetic (quantities
    are integer-valued), exact on both engines (no division, no
    epsilon, no decimal typing).

    Scale: window over l_partkey reuses the shuffle a groupBy would
    need anyway; the part filter broadcasts before the fact scan.
    """
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    w = Window.partitionBy("l_partkey")
    qty = F.col("l_quantity").cast("bigint")
    with_stats = li.withColumn("sum_qty", F.sum(qty).over(w)).withColumn(
        "cnt", F.count(F.lit(1)).over(w)
    )
    return (
        with_stats.filter(qty * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("bigint")
                ).cast("double")
                / F.lit(100.0)
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


@register(
    "q_tpch_q22_idle_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 / COUNT(*) AS threshold
      FROM customer WHERE c_acctbal > 0
    )
    SELECT n.n_name AS nation,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    CROSS JOIN avg_bal
    WHERE c.c_acctbal > avg_bal.threshold
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY n.n_name
    ORDER BY nation
    """,
)
def q_tpch_q22_idle_customers(spark, sf_dir):
    """TPC-H Q22 adapted (no phone column → grouped by nation; every
    sf0.01 customer has orders → "never placed an URGENT order" keeps
    the anti-join selective): above-average-balance customers with no
    urgent orders. Scalar AVG subquery (decimal-sum/count, the davg
    parity pattern) + predicated left-anti join against orders.

    Scale: the anti join shuffles customer vs orders' custkey
    projection; the scalar threshold broadcasts as a 1-row frame.
    """
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    bal = F.round(F.col("c_acctbal") * 100).cast("bigint")
    threshold = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(bal).cast("double")
                / F.lit(100.0)
                / F.count(F.lit(1))
            ).alias("threshold")
        )
    )
    return (
        c.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(bal).cast("double") / F.lit(100.0)).alias("totacctbal"),
        )
        .orderBy("nation")
    )
