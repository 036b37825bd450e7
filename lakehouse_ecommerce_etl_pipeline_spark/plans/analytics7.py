"""Analytics tier VII: edit-distance fuzzy dedup and group-wise
linear regression.

Cross-engine exactness: ``levenshtein`` is an integer metric with
identical semantics in Spark and DuckDB, so fuzzy-pair outputs match
exactly; the regression derives slope/intercept/correlation in double
arithmetic from DECIMAL-exact moment sums (n, Σx, Σy, Σxx, Σxy, Σyy)
with the same expression text on both engines — identical rational
inputs through identical IEEE-754 ops give identical doubles.

Reference parity: the reference's data-quality layer does only exact
equality dedup (glue_jobs/*_etl.py dropDuplicates); edit-distance
blocking extends that to the near-dup tier a training-data pipeline
needs, alongside the MinHash/SimHash family in llm/.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


@register(
    "q_fuzzy_editdist_pairs",
    oracle="""
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(substr(a.text, 1, 64), substr(b.text, 1, 64))
                AS INTEGER) AS dist
    FROM documents a
    JOIN documents b
      ON a.lang = b.lang
     AND substr(a.text, 1, 8) = substr(b.text, 1, 8)
     AND a.doc_id < b.doc_id
    WHERE levenshtein(substr(a.text, 1, 64), substr(b.text, 1, 64)) <= 10
    """,
)
def q_fuzzy_editdist_pairs(spark, sf_dir):
    """Near-duplicate pairs by bounded edit distance over 64-char
    prefixes, blocked on (lang, 8-char prefix) so only candidates that
    already share a block are compared — the standard blocking trick
    that turns the O(n^2) all-pairs edit-distance scan into a
    per-block self-join.

    Scale: the equi-join on the blocking key shuffles both sides by
    (lang, prefix) and compares within blocks only; block sizes are
    data-bounded, and a hot template prefix can be salted with the
    existing skew helpers. Levenshtein runs JVM-side (no Python)."""
    d = load(spark, sf_dir, "documents").select(
        F.col("doc_id"),
        F.col("lang"),
        F.substring("text", 1, 8).alias("blk"),
        F.substring("text", 1, 64).alias("pfx"),
    )
    a = d.select(
        F.col("doc_id").alias("id_a"),
        F.col("lang").alias("lang_a"),
        F.col("blk").alias("blk_a"),
        F.col("pfx").alias("pfx_a"),
    )
    b = d.select(
        F.col("doc_id").alias("id_b"),
        F.col("lang").alias("lang_b"),
        F.col("blk").alias("blk_b"),
        F.col("pfx").alias("pfx_b"),
    )
    return (
        a.join(
            b,
            (F.col("lang_a") == F.col("lang_b"))
            & (F.col("blk_a") == F.col("blk_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .withColumn("dist", F.levenshtein("pfx_a", "pfx_b").cast("int"))
        .filter(F.col("dist") <= 10)
        .select("id_a", "id_b", "dist")
    )


@register(
    "q_groupwise_regression",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))
                      * CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))
                      * CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
                      * CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_obs,
           (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0.0) AS slope,
           (sy - ((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0.0)) * sx)
             / n AS intercept,
           (n * sxy - sx * sy)
             / NULLIF(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 0.0)
             AS corr_xy
    FROM m ORDER BY l_returnflag
    """,
)
def q_groupwise_regression(spark, sf_dir):
    """Per-group OLS of extended price on quantity (slope, intercept,
    Pearson correlation) — the regr_slope/regr_intercept/corr family,
    but derived from DECIMAL-exact moment sums instead of the engines'
    streaming float accumulators, which are order-dependent and would
    never hash-match across engines.

    Scale: one map-side-combinable aggregation over 3 group keys —
    the six moments travel as a single partial-agg row per partition
    per key, so the shuffle is O(groups), not O(rows)."""
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(8,2)")
    y = F.col("l_extendedprice").cast("decimal(10,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    slope = F.try_divide(cov_n, F.nullif(var_x, F.lit(0.0)))
    return m.select(
        "l_returnflag",
        n.cast("bigint").alias("n_obs"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
        F.try_divide(
            cov_n,
            F.nullif(F.sqrt(var_x * (n * syy - sy * sy)), F.lit(0.0)),
        ).alias("corr_xy"),
    ).orderBy("l_returnflag")
