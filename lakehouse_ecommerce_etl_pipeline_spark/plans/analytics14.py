"""Analytics tier XIV: training-mixture sampling and PII masking.

Cross-engine exactness: sampling decisions are lexicographic md5-hex
comparisons against dyadic hex thresholds ('c' = 3/4, '8' = 1/2,
'4' = 1/4) — the deterministic-sampling trick from the train/val
split (llm/sampling.py), no float RNG anywhere; masking is string
surgery plus md5 pseudonyms and FLOOR bucketing (IEEE division is
bit-deterministic on both engines, FLOOR avoids the HALF_UP/banker's
rounding divergence).

Reference parity: the reference nulls/quarantines bad PII-ish fields
but has no masking layer (glue_jobs/*_etl.py drop/reject only);
masking + stable pseudonyms is the governance feature its curated
zone would need before exposing data to Athena consumers. Mixture
sampling is the LLM-data counterpart of its per-source ingest paths.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_HIGH = ("src0", "src1", "src2", "src3", "src4")
_MID = ("src5", "src6", "src7", "src8", "src9")


@register(
    "q_source_mixture_sample",
    oracle=f"""
    SELECT doc_id, source,
           CASE WHEN source IN {_HIGH} THEN CAST(0.75 AS DOUBLE)
                WHEN source IN {_MID} THEN CAST(0.5 AS DOUBLE)
                ELSE CAST(0.25 AS DOUBLE) END AS target_rate
    FROM documents
    WHERE md5('mix:' || CAST(doc_id AS VARCHAR)) <
          CASE WHEN source IN {_HIGH} THEN 'c'
               WHEN source IN {_MID} THEN '8'
               ELSE '4' END
    """,
)
def q_source_mixture_sample(spark, sf_dir):
    """Deterministic data-mixture sampling: each source gets a target
    inclusion rate (0.75 / 0.5 / 0.25) and a document survives iff
    md5('mix:' || doc_id) falls below the source's dyadic hex
    threshold — reweighting a training corpus toward high-quality
    sources with zero RNG state, reproducible across engines, runs
    and partitionings.

    100 TB: a narrow filter — no shuffle, no sampling pass, no
    per-source partitioning needed; rates change by editing the
    threshold map, and unioned corpora re-sample consistently because
    the hash keys on stable doc ids. The same construction gives
    disjoint train/val (llm/sampling.py) — prefix-band membership is
    composable."""
    high = F.col("source").isin(*_HIGH)
    mid = F.col("source").isin(*_MID)
    threshold = F.when(high, "c").when(mid, "8").otherwise("4")
    rate = F.when(high, F.lit(0.75)).when(mid, F.lit(0.5)).otherwise(F.lit(0.25))
    return (
        load(spark, sf_dir, "documents")
        .filter(
            F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
            < threshold
        )
        .select("doc_id", "source", rate.alias("target_rate"))
    )


@register(
    "q_mask_pii",
    oracle="""
    SELECT substr(c_name, 1, 9) || '***' AS masked_name,
           md5('pii:' || CAST(c_custkey AS VARCHAR)) AS pseudonym,
           CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS balance_band,
           c_mktsegment
    FROM customer
    """,
)
def q_mask_pii(spark, sf_dir):
    """Column-level masking for the curated zone: truncate the
    identifying suffix of the name, replace the natural key with a
    stable salted-hash pseudonym (joinable across tables masked with
    the same salt, non-reversible without it), and generalize the
    exact balance to a 1000-unit band (k-anonymity-style coarsening).

    100 TB: all codegen'd scalar expressions — masking at read/write
    costs nothing over the scan; pseudonyms preserve join keys so
    masked marts still join, which is the property naive row-hash
    masking destroys."""
    return load(spark, sf_dir, "customer").select(
        F.concat(F.substring("c_name", 1, 9), F.lit("***")).alias("masked_name"),
        F.md5(F.concat(F.lit("pii:"), F.col("c_custkey").cast("string"))).alias(
            "pseudonym"
        ),
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("balance_band"),
        "c_mktsegment",
    )


@register("q_kmeans_clusters")  # rows-only: float means are order-dependent
def q_kmeans_clusters(spark, sf_dir):
    """Lloyd's k-means (k=4, 3 iterations, deterministic seeds) over
    the embeddings table — the iterative-algorithm tier; JVM-side
    distance folds, one shuffle per iteration (llm/kmeans.py).
    Rows-only: centroid means accumulate floats in partition order, so
    no cross-engine oracle; invariants are pytest-checked (coverage,
    inertia monotonicity)."""
    from lakehouse_ecommerce_etl_pipeline_spark.llm.kmeans import kmeans

    emb = load(spark, sf_dir, "embeddings")
    return kmeans(emb, k=4, iters=3)


@register(
    "q_histogram_equidepth",
    oracle="""
    WITH b AS (
      SELECT l_extendedprice AS val,
             ntile(10) OVER (ORDER BY l_extendedprice, l_orderkey,
                             l_linenumber) AS bucket
      FROM lineitem
    )
    SELECT CAST(bucket AS INTEGER) AS bucket,
           COUNT(*) AS n,
           MIN(val) AS lo,
           MAX(val) AS hi
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def q_histogram_equidepth(spark, sf_dir):
    """Equi-depth (decile) histogram of extended price — the quantile-
    bucket companion to the fixed-width q_histogram. Raw double
    min/max per bucket (no float arithmetic), full (value, orderkey,
    linenumber) tiebreak so both engines cut identical buckets.

    PRODUCTION PLAN: the boundary-cut exact global ntile
    (operators/ranks.py) — percentile probe → literal bucket cuts →
    balanced per-bucket windows → closed-form NTILE arithmetic. No
    single-partition window at data grain; bit-equal to the NTILE
    form for this total order (pytest-pinned via
    q_histogram_equidepth_window_form, oracle unchanged)."""
    from lakehouse_ecommerce_etl_pipeline_spark.operators.ranks import (
        with_global_ntile,
    )

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("val"), "l_orderkey", "l_linenumber"
    )
    tiled = with_global_ntile(
        li,
        ["val", "l_orderkey", "l_linenumber"],
        primary="val",
        k=10,
        alias="bucket",
        secondary="l_orderkey",
    )
    return (
        tiled.groupBy(F.col("bucket").cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("val").alias("lo"),
            F.max("val").alias("hi"),
        )
        .orderBy("bucket")
    )


def q_histogram_equidepth_window_form(spark, sf_dir):
    """The NTILE oracle-exactness twin (the former production plan):
    single-reducer global sort — kept as the semantics witness the
    boundary-cut plan is pytest-pinned against."""
    from pyspark.sql import Window

    w = Window.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    return (
        load(spark, sf_dir, "lineitem")
        .select(
            F.col("l_extendedprice").alias("val"),
            F.ntile(10).over(w).alias("bucket"),
        )
        .groupBy(F.col("bucket").cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("val").alias("lo"),
            F.max("val").alias("hi"),
        )
        .orderBy("bucket")
    )
