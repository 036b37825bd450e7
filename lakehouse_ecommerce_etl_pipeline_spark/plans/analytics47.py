"""Analytics tier XLVII: in-database model training primitives.

New shapes over I-XLVI: an exhaustive decision-stump split search
(the 1-node decision tree — scan all candidate thresholds with one
window pass, pick the impurity-minimizing split; the building block
boosted trees repeat millions of times), and rank-based quantile
normalization (map a skewed feature to uniform [0,1] by rank — the
preprocessing step tree-free models want).

Cross-engine exactness: split-gain comparison uses doubles assembled
once per candidate from exact integer counts, with the threshold as
a total-order tiebreak; quantile ranks come from a totally-ordered
window and normalize with one integer division."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


def _stump_by_x(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-threshold histogram shared by the production plan and
    its window-form twin: per distinct price, (row count, positives)."""
    pts = load(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("x"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("pos"),
    )
    return pts.groupBy("x").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("npos"),
    )


def _stump_score(s: DataFrame) -> DataFrame:
    """Impurity scoring + argmin over the cumulated candidate table
    (shared by production plan and twin).  The count products
    pos·neg run on DECIMAL(38,0) (protection class: unconditional
    widening — DESIGN.md §19): cumulative counts are fact-grain, so
    int64 products would throw under ANSI at ~6.1e9 rows;
    support-grain rows make the widening free and decimal→double
    rounds identically, so the released score is bit-equal below the
    old bound."""
    dec = "decimal(38,0)"
    n_right = F.col("n_all") - F.col("n_left")
    pos_right = F.col("pos_all") - F.col("pos_left")
    score = (
        (
            F.col("pos_left").cast(dec)
            * (F.col("n_left") - F.col("pos_left")).cast(dec)
        ).cast("double")
        / F.col("n_left").cast("double")
        + (pos_right.cast(dec) * (n_right - pos_right).cast(dec)).cast(
            "double"
        )
        / n_right.cast("double")
    )
    return (
        s.filter(n_right > 0)
        .select(
            F.col("x").alias("threshold"),
            "n_left",
            "pos_left",
            n_right.alias("n_right"),
            pos_right.alias("pos_right"),
            score.alias("impurity_score"),
        )
        .orderBy("impurity_score", "threshold")
        .limit(1)
    )


@register(
    "q_decision_stump",
    oracle="""
    WITH pts AS (
      SELECT o_totalprice AS x,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
      FROM orders
    ),
    by_x AS (
      SELECT x, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(pos) AS BIGINT) AS npos
      FROM pts GROUP BY x
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_all,
             CAST(SUM(npos) AS BIGINT) AS pos_all
      FROM by_x
    ),
    cum AS (
      SELECT x,
             CAST(SUM(n) OVER w AS BIGINT) AS n_left,
             CAST(SUM(npos) OVER w AS BIGINT) AS pos_left
      FROM by_x
      WINDOW w AS (ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    scored AS (
      SELECT c.x AS threshold, c.n_left, c.pos_left,
             t.n_all - c.n_left AS n_right,
             t.pos_all - c.pos_left AS pos_right,
             CAST(c.pos_left * (c.n_left - c.pos_left) AS DOUBLE)
               / CAST(c.n_left AS DOUBLE)
             + CAST((t.pos_all - c.pos_left)
                    * ((t.n_all - c.n_left)
                       - (t.pos_all - c.pos_left)) AS DOUBLE)
               / CAST(t.n_all - c.n_left AS DOUBLE) AS impurity_score
      FROM cum c CROSS JOIN tot t
      WHERE t.n_all - c.n_left > 0
    )
    SELECT threshold, n_left, pos_left, n_right, pos_right,
           impurity_score
    FROM scored
    ORDER BY impurity_score, threshold
    LIMIT 1
    """,
)
def q_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exhaustive decision-stump training: find the split
    ``x <= threshold`` on order price that best separates fulfilled
    from open orders — minimize the (un-normalized) weighted Gini
    ``posL·negL/nL + posR·negR/nR`` over EVERY candidate threshold in
    one pass: group to distinct values, one cumulative window, score,
    argmin.  The score is assembled once per candidate from exact
    integer counts (identical doubles both engines); (score,
    threshold) is a total order so the winning split is engine-exact.

    100 TB: this is how a boosted-tree trainer evaluates a feature —
    histogram the feature (the group-by; production bins to ~256
    buckets instead of exact distincts, same plan), cumulate, score
    every bin boundary, pick the argmin with TakeOrderedAndProject.
    The fact table is touched exactly once.  The cumulation runs as a
    boundary-cut parallel prefix sum (operators/ranks.py), NOT an
    unpartitioned cumulative window (VERDICT r7: o_totalprice is
    ~distinct per order, so the candidate support is FACT-grain —
    14,999 of 15,000 orders at sf0.01 — and a single-partition sort
    over it is the exact shape the prefix-sum machinery exists to
    kill); former window form kept as the pytest-pinned twin, oracle
    unchanged."""
    from lakehouse_ecommerce_etl_pipeline_spark.operators.ranks import (
        with_global_running_sums,
    )

    by_x = _stump_by_x(spark, sf_dir)
    tot = by_x.agg(
        F.sum("n").cast("bigint").alias("n_all"),
        F.sum("npos").cast("bigint").alias("pos_all"),
    )
    cum = with_global_running_sums(
        by_x, ["x"], primary="x",
        value_cols=["n", "npos"], aliases=["n_left", "pos_left"],
    ).select("x", "n_left", "pos_left")
    return _stump_score(cum.crossJoin(tot))


def q_decision_stump_window_form(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cumulative-window oracle-exactness twin (former production
    plan), pytest-pinned equal to the boundary-cut prefix sums."""
    by_x = _stump_by_x(spark, sf_dir)
    tot = by_x.agg(
        F.sum("n").cast("bigint").alias("n_all"),
        F.sum("npos").cast("bigint").alias("pos_all"),
    )
    w = Window.orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = by_x.select(
        "x",
        F.sum("n").over(w).cast("bigint").alias("n_left"),
        F.sum("npos").over(w).cast("bigint").alias("pos_left"),
    )
    return _stump_score(cum.crossJoin(tot))


@register(
    "q_quantile_normalize",
    oracle="""
    WITH r AS (
      SELECT o_orderkey, o_orderpriority,
             RANK() OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice, o_orderkey) AS rk,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT o_orderkey, o_orderpriority,
           CAST(rk - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE) AS qnorm
    FROM r WHERE n > 1
    """,
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based quantile normalization of order price WITHIN each
    priority segment: qnorm = (rank−1)/(n−1) maps any skewed feature
    onto uniform [0,1] per group — the robust scaling step linear
    models and neural feature pipelines apply where tree models
    wouldn't care.  The (price, orderkey) order is total, so ranks —
    and the one integer division — are engine-exact.

    100 TB: one sort-based window per segment partition (the shuffle
    is on the segment key, identical to q_rank_auc's profile).  For
    an UN-partitioned global normalize at scale, replace the window
    with percentile-bucket assignment against one-pass computed
    quantile edges (q_quantile_bucket_assign's plan) — rank exactness
    traded for no global sort."""
    w_rank = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    w_n = Window.partitionBy("o_orderpriority")
    r = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w_rank).alias("rk"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    return r.filter(F.col("n") > 1).select(
        "o_orderkey",
        "o_orderpriority",
        (
            (F.col("rk") - 1).cast("double")
            / (F.col("n") - 1).cast("double")
        ).alias("qnorm"),
    )
