"""Analytics tier XXVI: privacy & lifecycle governance.

New shapes over I-XXV: k-anonymity / l-diversity measurement over a
quasi-identifier grid (the re-identification risk report that gates a
dataset release), a retention sweep (rows past a fixed retention
horizon, summarized at the partition grain a VACUUM/DELETE job would
operate on), and a GDPR-erasure audit (long-form cross-table count of
the rows an erasure request would delete — the read-only dry run of
the delete pipeline).

These extend the governance tier (q_mask_pii, q_dq_expectations):
masking transforms, DQ gates, and now the measurement/lifecycle
queries a lakehouse compliance story needs. The reference documents
retention/cleanup intent (OPTIMIZE/VACUUM,
docs/full_implementation_guide.md:317-321) with no code.

Cross-engine exactness: everything here is integer counting, integer
banding (FLOOR), and date arithmetic — no float ever decides a row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_K_ANON = 5


@register(
    "q_k_anonymity",
    oracle=f"""
    WITH g AS (
      SELECT c_mktsegment,
             c_nationkey,
             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS balance_band,
             COUNT(*) AS group_size,
             COUNT(DISTINCT c_custkey) AS n_sensitive
      FROM customer
      GROUP BY 1, 2, 3
    )
    SELECT c_mktsegment, c_nationkey, balance_band, group_size,
           n_sensitive AS l_diversity,
           group_size < {_K_ANON} AS below_k
    FROM g
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity report over the quasi-identifier grid
    (segment, nation, banded balance): group sizes, the count of
    distinct sensitive values per group (l-diversity, with c_custkey
    standing in for the sensitive attribute), and the below-k flag
    that gates release — an equivalence class smaller than k re-
    identifies its members under linkage. Banding is integer FLOOR
    division; every decision is an integer compare.

    100 TB: one map-side-combined aggregation over the grid — the
    grid cardinality, not the table, is the working set. The
    remediation loop (generalize bands until no group is below k)
    re-runs this query per candidate banding; pair with q_mask_pii
    for the transform side."""
    return (
        load(spark, sf_dir, "customer")
        .groupBy(
            "c_mktsegment",
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias(
                "balance_band"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.count_distinct("c_custkey").alias("l_diversity"),
        )
        .withColumn("below_k", F.col("group_size") < _K_ANON)
    )


@register(
    "q_retention_sweep",
    oracle="""
    SELECT date_trunc('day', ts) AS day_partition,
           COUNT(*) AS n_expired,
           MIN(ts) AS oldest,
           MAX(ts) AS newest
    FROM events
    WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
    GROUP BY 1
    """,
)
def q_retention_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention sweep: events past the retention horizon (a fixed
    policy date — deterministic against the frozen corpus), summarized
    at the day-partition grain the cleanup job operates on. This is
    the read-only planning pass of a retention DELETE: the partition
    list it emits is exactly what a partitioned table can drop as
    whole files (partition-pruned, no row rewrite).

    100 TB: the predicate prunes to expired partitions only — the
    sweep reads metadata-adjacent slices, not the table; the output
    is O(|expired partitions|). reference: VACUUM/retention is
    documented intent (docs:317-321) with no implementation."""
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("ts") < cutoff)
        .groupBy(F.date_trunc("day", "ts").alias("day_partition"))
        .agg(
            F.count(F.lit(1)).alias("n_expired"),
            F.min("ts").alias("oldest"),
            F.max("ts").alias("newest"),
        )
    )


@register(
    "q_gdpr_erasure_audit",
    oracle="""
    WITH targets AS (
      SELECT c_custkey AS user_key FROM customer WHERE c_custkey % 97 = 0
    ),
    ev AS (
      SELECT 'events' AS table_name, COUNT(*) AS n_rows,
             COUNT(DISTINCT user_id) AS n_subjects
      FROM events WHERE user_id IN (SELECT user_key FROM targets)
    ),
    o AS (
      SELECT 'orders' AS table_name, COUNT(*) AS n_rows,
             COUNT(DISTINCT o_custkey) AS n_subjects
      FROM orders WHERE o_custkey IN (SELECT user_key FROM targets)
    ),
    c AS (
      SELECT 'customer' AS table_name, COUNT(*) AS n_rows,
             COUNT(DISTINCT c_custkey) AS n_subjects
      FROM customer WHERE c_custkey IN (SELECT user_key FROM targets)
    )
    SELECT * FROM ev UNION ALL SELECT * FROM o UNION ALL SELECT * FROM c
    """,
)
def q_gdpr_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR-erasure dry run: for a deterministic subject set (every
    97th customer key), the long-form per-table count of rows an
    erasure request would touch — the audit artifact produced BEFORE
    any delete runs, and the same left-semi probes the delete job
    itself would use. Long-form (table, n_rows, n_subjects) keeps the
    report queryable like q_dq_expectations.

    100 TB: the subject set broadcasts to a semi-join per fact table
    (each a single pruned scan); subject-key bucketing or a Bloom
    prefilter (q_bloom_prefilter_join) bounds the probe when the
    request batch is large. Deletes then rewrite only matched files
    (MERGE DELETE / deletion vectors on a real Delta deployment)."""
    targets = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 97 == 0)
        .select(F.col("c_custkey").alias("user_key"))
    )

    def audit(df: DataFrame, key: str, name: str) -> DataFrame:
        return (
            df.join(
                F.broadcast(targets), df[key] == targets["user_key"], "leftsemi"
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count_distinct(key).alias("n_subjects"),
            )
            .select(F.lit(name).alias("table_name"), "n_rows", "n_subjects")
        )

    ev = audit(load(spark, sf_dir, "events"), "user_id", "events")
    o = audit(load(spark, sf_dir, "orders"), "o_custkey", "orders")
    c = audit(load(spark, sf_dir, "customer"), "c_custkey", "customer")
    return ev.unionByName(o).unionByName(c)
