"""Analytics tier XXIX: distribution diagnostics for partitioning and
customer behavior.

New shapes over I-XXVIII: a hash-partition skew profile (row counts
per portable hash bucket of the join key — the diagnostic that
decides salting factors and AQE skew thresholds BEFORE a job runs),
a category-overlap matrix (distinct-customer intersections between
order priorities — the cross-category affinity table), and the
repeat-purchase curve (customers by order count with a cumulative
share — the retention distribution behind LTV models).

Cross-engine exactness: the hash bucket is md5-derived (engine
hash() functions differ; md5 doesn't), counts are integers, and the
cumulative share is an IEEE division of exact integers under a total
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_N_BUCKETS = 32


@register(
    "q_hash_partition_profile",
    oracle=f"""
    WITH b AS (
      SELECT CAST(CONCAT('0x', substring(md5(CAST(l_orderkey AS VARCHAR)),
                                         1, 6)) AS BIGINT) % {_N_BUCKETS}
               AS bucket
      FROM lineitem
    )
    SELECT bucket, COUNT(*) AS n_rows
    FROM b GROUP BY bucket
    """,
)
def q_hash_partition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-partition skew profile: rows per bucket when the fact
    table is hash-distributed on its join key into {_N_BUCKETS}
    buckets — the pre-flight diagnostic for shuffle sizing (a flat
    profile means plain hash partitioning is fine; a spiked one
    prescribes salting or AQE skew-join thresholds). The bucket is
    md5-derived so the profile is engine-portable (native hash()
    functions are not), which also makes it an honest stand-in for
    "any reasonable hash".

    100 TB: one map-side-combined aggregate to {_N_BUCKETS} rows —
    run it on the 1% sample first; the profile shape converges long
    before the full scan. Pair with q_log2_histogram (value skew) and
    q_countmin_heavy_hitters (key identity)."""
    b = load(spark, sf_dir, "lineitem").select(
        (
            F.conv(
                F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 6),
                16,
                10,
            ).cast("bigint")
            % _N_BUCKETS
        ).alias("bucket")
    )
    return b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "q_category_overlap",
    oracle="""
    WITH d AS (SELECT DISTINCT o_custkey, o_orderpriority FROM orders)
    SELECT a.o_orderpriority AS pri_a, b.o_orderpriority AS pri_b,
           COUNT(*) AS n_shared_customers
    FROM d a JOIN d b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderpriority < b.o_orderpriority
    GROUP BY 1, 2
    """,
)
def q_category_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category-overlap matrix: how many distinct customers ordered
    under BOTH priorities, for every priority pair — the cross-
    category affinity table (audience overlap) behind cross-sell and
    cannibalization analyses. Orientation (a < b) keeps one row per
    unordered pair.

    100 TB: dedup to the (customer, category) grain first — the
    self-join then co-partitions on the customer key and the blowup
    is bounded by categories-per-customer squared (tiny), never by
    order volume. The same shape at higher cardinality (overlap
    between thousands of audiences) switches to the bitmap tier
    (q_bitmap_distinct) with AND-popcounts."""
    d = (
        load(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderpriority")
        .distinct()
    )
    a = d.select(
        F.col("o_custkey").alias("ck"), F.col("o_orderpriority").alias("pri_a")
    )
    b = d.select(
        F.col("o_custkey").alias("ck"), F.col("o_orderpriority").alias("pri_b")
    )
    return (
        a.join(b, "ck")
        .filter(F.col("pri_a") < F.col("pri_b"))
        .groupBy("pri_a", "pri_b")
        .agg(F.count(F.lit(1)).alias("n_shared_customers"))
    )


@register(
    "q_repeat_purchase_curve",
    oracle="""
    WITH c AS (
      SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
    ),
    h AS (
      SELECT n_orders, COUNT(*) AS n_customers FROM c GROUP BY n_orders
    )
    SELECT n_orders, n_customers,
           CAST(CAST(SUM(n_customers) OVER (ORDER BY n_orders) AS BIGINT)
                AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM c) AS DOUBLE) AS cum_share
    FROM h
    """,
)
def q_repeat_purchase_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase curve: the distribution of customers by order
    count, with the cumulative customer share up each frequency level
    — the retention histogram LTV and cohort models calibrate
    against. Cumulative share is one IEEE division of exact integers
    under the total n_orders order.

    100 TB: two map-side-combined aggregations collapsing to
    |distinct order counts| rows; the running sum windows over that
    tiny domain, never over customers."""
    c = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    total = c.count()
    h = c.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))
    w = Window.orderBy("n_orders").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return h.select(
        "n_orders",
        "n_customers",
        (
            F.sum("n_customers").over(w).cast("bigint").cast("double")
            / F.lit(float(total))
        ).alias("cum_share"),
    )
