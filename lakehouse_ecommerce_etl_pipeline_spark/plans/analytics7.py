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

    Scale: the DP kernel runs once per DISTINCT prefix-value pair,
    not per document pair — edit distance depends only on the string
    values, so the plan compares the distinct (lang, blk, pfx) value
    table against itself (banded levenshtein, threshold form) and
    then EXPANDS surviving value pairs back to member document pairs
    with equi-joins; same-value pairs are emitted directly at dist 0.
    On a replicated corpus this is the difference between quadratic-
    in-duplicates and quadratic-in-distinct-values: measured at
    sf1-equivalent documents, 1,037,500 raw block pairs collapse to
    7,535 distinct-value comparisons (138x less DP work) while the
    output is identical. The expansion joins produce exactly the
    output rows — when exact duplicates are abundant the OUTPUT is
    inherently quadratic in the duplicate-group size, which is the
    argument for running exact dedup before fuzzy linkage in a real
    pipeline. Levenshtein runs JVM-side (no Python)."""
    d = load(spark, sf_dir, "documents").select(
        F.col("doc_id"),
        F.col("lang"),
        F.substring("text", 1, 8).alias("blk"),
        F.substring("text", 1, 64).alias("pfx"),
    )
    vals = d.select("lang", "blk", "pfx").distinct()
    va = vals.select(
        F.col("lang").alias("lang_a"),
        F.col("blk").alias("blk_a"),
        F.col("pfx").alias("pfx_a"),
    )
    vb = vals.select(
        F.col("lang").alias("lang_b"),
        F.col("blk").alias("blk_b"),
        F.col("pfx").alias("pfx_b"),
    )
    # distinct value pairs within a block, ordered pfx_a <= pfx_b so
    # equal-value pairs appear once; banded levenshtein (returns -1
    # past 10) runs once per DISTINCT unequal value pair, equal
    # values are dist 0 by definition (no DP)
    vp = (
        va.join(
            vb,
            (F.col("lang_a") == F.col("lang_b"))
            & (F.col("blk_a") == F.col("blk_b"))
            & (F.col("pfx_a") <= F.col("pfx_b")),
        )
        .withColumn(
            "dist",
            F.when(F.col("pfx_a") == F.col("pfx_b"), F.lit(0))
            .otherwise(F.levenshtein("pfx_a", "pfx_b", 10))
            .cast("int"),
        )
        .filter(F.col("dist") >= 0)
        .select("lang_a", "pfx_a", "pfx_b", "dist")
    )
    ma = d.select(
        F.col("doc_id").alias("ida"),
        F.col("lang").alias("lang_a"),
        F.col("pfx").alias("pfx_a"),
    )
    mb = d.select(
        F.col("doc_id").alias("idb"),
        F.col("lang").alias("lang_b"),
        F.col("pfx").alias("pfx_b"),
    )
    # one expansion path: for unequal value pairs every member cross
    # pair qualifies (ids ordered by least/greatest); for equal-value
    # pairs keep ida < idb to emit each unordered pair once
    return (
        vp.join(ma, ["lang_a", "pfx_a"])
        .join(
            mb,
            (F.col("lang_a") == F.col("lang_b"))
            & (vp["pfx_b"] == mb["pfx_b"]),
        )
        .filter(
            (vp["pfx_a"] != vp["pfx_b"]) | (F.col("ida") < F.col("idb"))
        )
        .select(
            F.least("ida", "idb").alias("id_a"),
            F.greatest("ida", "idb").alias("id_b"),
            "dist",
        )
    )


@register(
    "q_groupwise_regression",
    oracle="""
    WITH z AS (
      SELECT l_returnflag,
             CAST(FLOOR(l_quantity) AS DECIMAL(18,0)) AS x,
             CAST(FLOOR(l_extendedprice / 100) AS DECIMAL(18,0)) AS y
      FROM lineitem
    ),
    m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DECIMAL(18,0)) AS n,
             CAST(SUM(x) AS DECIMAL(18,0)) AS sx,
             CAST(SUM(y) AS DECIMAL(18,0)) AS sy,
             CAST(SUM(x * x) AS DECIMAL(18,0)) AS sxx,
             CAST(SUM(x * y) AS DECIMAL(18,0)) AS sxy,
             CAST(SUM(y * y) AS DECIMAL(18,0)) AS syy
      FROM z GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_obs,
           CAST(n * sxy - sx * sy AS DOUBLE) * 100.0
             / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0) AS slope,
           CAST(sy * sxx - sx * sxy AS DOUBLE) * 100.0
             / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0) AS intercept,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                           * CAST(n * syy - sy * sy AS DOUBLE)), 0.0)
             AS corr_xy
    FROM m ORDER BY l_returnflag
    """,
)
def q_groupwise_regression(spark, sf_dir):
    """Per-group OLS of extended price on quantity (slope, intercept,
    Pearson correlation) — the regr_slope/regr_intercept/corr family,
    derived from DECIMAL-exact moment sums instead of the engines'
    streaming float accumulators, which are order-dependent and would
    never hash-match across engines. Price rides a FLOOR(y/100)
    hundred-dollar grid (quantity is already integral) so every
    closed-form numerator — n·Σxy−ΣxΣy, ΣyΣx²−ΣxΣxy, the variance
    terms — is an exact decimal whose value stays below 2^53 at
    oracle scale; a decimal bigger than that casts to double through
    DuckDB's multi-rounding hugeint path while Spark rounds once,
    a last-ulp divergence no formula fixes. Slope/intercept are
    rescaled ·100 back to dollars in the final (identical-shape)
    float expression; corr is scale-free.

    Scale: one map-side-combinable aggregation over 3 group keys —
    the six moments travel as a single partial-agg row per partition
    per key, so the shuffle is O(groups), not O(rows)."""
    li = load(spark, sf_dir, "lineitem")
    z = li.select(
        "l_returnflag",
        F.floor(F.col("l_quantity")).cast("decimal(18,0)").alias("x"),
        F.floor(F.col("l_extendedprice") / 100)
        .cast("decimal(18,0)")
        .alias("y"),
    )
    m = z.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("decimal(18,0)").alias("n"),
        F.sum("x").cast("decimal(18,0)").alias("sx"),
        F.sum("y").cast("decimal(18,0)").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(18,0)").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(18,0)").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(18,0)").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    cov_n = (n * sxy - sx * sy).cast("double")
    var_x = (n * sxx - sx * sx).cast("double")
    var_y = (n * syy - sy * sy).cast("double")
    ic_num = (sy * sxx - sx * sxy).cast("double")
    return m.select(
        "l_returnflag",
        n.cast("bigint").alias("n_obs"),
        F.try_divide(cov_n * 100.0, F.nullif(var_x, F.lit(0.0))).alias(
            "slope"
        ),
        F.try_divide(ic_num * 100.0, F.nullif(var_x, F.lit(0.0))).alias(
            "intercept"
        ),
        F.try_divide(
            cov_n, F.nullif(F.sqrt(var_x * var_y), F.lit(0.0))
        ).alias("corr_xy"),
    ).orderBy("l_returnflag")
