"""Analytical tier IV: cross join, null-handling battery, positional
explode — the long-tail relational surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


@register(
    "q_cross_join",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
)
def q_cross_join(spark, sf_dir):
    """Explicit Cartesian product (dim × dim only — a cross join with a
    fact side is a plan bug at any scale)."""
    r = load(spark, sf_dir, "region").select("r_name")
    n = load(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@register(
    "q_na_handling",
    oracle="""
    WITH j AS (
      SELECT o.o_orderkey, c.c_name, c.c_acctbal
      FROM orders o
      LEFT JOIN (SELECT c_custkey, c_name, c_acctbal FROM customer
                 WHERE c_acctbal > 7000) c
        ON o.o_custkey = c.c_custkey
    )
    SELECT o_orderkey,
           coalesce(c_name, 'unknown') AS name_filled,
           coalesce(c_acctbal, 0.0) AS bal_filled,
           (c_name IS NULL) AS was_null
    FROM j
    """,
)
def q_na_handling(spark, sf_dir):
    """Null-handling battery: fillna over join-produced NULLs +
    null-flag derivation (na.fill ≡ coalesce)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 7000)
        .select("c_custkey", "c_name", "c_acctbal")
    )
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
    return (
        j.withColumn("was_null", F.col("c_name").isNull())
        .na.fill({"c_name": "unknown", "c_acctbal": 0.0})
        .select(
            "o_orderkey",
            F.col("c_name").alias("name_filled"),
            F.col("c_acctbal").alias("bal_filled"),
            "was_null",
        )
    )


@register(
    "q_posexplode",
    oracle="""
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS pos,
           ROUND(CAST(unnest(embedding) AS DOUBLE), 6) AS elem
    FROM embeddings WHERE vec_id < 20
    """,
)
def q_posexplode(spark, sf_dir):
    """Positional explode (1-based to match SQL ordinality)."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "elem")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("elem").cast("double"), 6).alias("elem"),
    )
