"""Analytics tier XLIX: time-decay attribution and CUSUM control.

New shapes over I-XLVIII: position-decayed multi-touch attribution
(each purchase's credit halves with every step back in the touch
sequence — completing the attribution family: linear, first/last,
now decay), and the CUSUM control chart computed by the
cumsum-minus-running-minimum identity — the recursive
``S_t = max(0, S_{t-1} + d_t)`` unrolled into two plain windows,
which is what makes a sequential changepoint statistic expressible
as a declarative plan at all.

Cross-engine exactness: decay weights are dyadic (2^-pos) with a
per-purchase rational normalizer assembled once from exact integers,
floor-scaled to integer picounits before any multi-row sum (the
q_attribution_linear convention); CUSUM deviations are n-scaled to
stay in BIGINT end-to-end, with one final division."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


@register(
    "q_attribution_time_decay",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT p.event_id, e.event_type AS channel,
             ROW_NUMBER() OVER (
               PARTITION BY p.event_id
               ORDER BY e.ts DESC, e.event_id DESC) AS pos
      FROM p JOIN events e
        ON e.user_id = p.user_id
       AND e.ts < p.ts
       AND e.ts >= p.ts - INTERVAL 24 HOUR
       AND e.event_type <> 'purchase'
    ),
    k AS (
      SELECT event_id, CAST(COUNT(*) AS BIGINT) AS k_total
      FROM touch GROUP BY event_id
    )
    SELECT t.channel,
           CAST(CAST(SUM(CAST(floor(
               POWER(CAST(2 AS DOUBLE), CAST(-t.pos AS DOUBLE))
               / (1 - POWER(CAST(2 AS DOUBLE), CAST(-k.k_total AS DOUBLE)))
               * 1e12
             ) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12 AS total_credit,
           COUNT(DISTINCT t.event_id) AS n_purchases
    FROM touch t JOIN k USING (event_id)
    GROUP BY t.channel
    """,
)
def q_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution: within each purchase's 24 h
    lookback, the most recent touch gets weight 2⁻¹, the next 2⁻²,
    …, normalized by (1 − 2⁻ᵏ) so each purchase distributes exactly
    one unit — the industry-standard halving-decay scheme, completing
    the attribution family (equal: q_attribution_linear; endpoint:
    q_attribution_first_last).  2⁻ᵖᵒˢ is an EXACT power of two in
    IEEE, the normalizer is one subtraction, and each share is
    floor-scaled to integer picounits before the channel sum — the
    same associativity armor the linear variant wears.

    100 TB: identical join profile to q_attribution_linear (equi on
    user_id, 24 h bounded range) plus one per-purchase window whose
    partitions are lookback-sized.  Decay parameterizes to any base
    by swapping the two constants."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    e = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_event_id"),
        F.col("event_type").alias("channel"),
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("t_ts").desc(), F.col("t_event_id").desc()
    )
    touch = (
        p.join(
            e,
            (F.col("t_user") == F.col("p_user"))
            & (F.col("t_ts") < F.col("p_ts"))
            & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 24 HOUR")),
        )
        .select("event_id", "channel", F.row_number().over(w).alias("pos"))
    )
    k = touch.groupBy("event_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("k_total")
    )
    share = F.pow(F.lit(2.0), -F.col("pos").cast("double")) / (
        1 - F.pow(F.lit(2.0), -F.col("k_total").cast("double"))
    )
    return (
        touch.join(k, "event_id")
        .groupBy("channel")
        .agg(
            (
                F.sum(F.floor(share * 1e12).cast("bigint"))
                .cast("bigint")
                .cast("double")
                / 1e12
            ).alias("total_credit"),
            F.countDistinct("event_id").alias("n_purchases"),
        )
    )


@register(
    "q_cusum_control",
    oracle="""
    WITH d AS (
      SELECT o_orderdate AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_orderdate
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS total
      FROM d
    ),
    cs AS (
      SELECT day, cents,
             CAST(SUM(cents * t.n - t.total) OVER w AS BIGINT) AS cum_dev,
             t.n
      FROM d CROSS JOIN tot t
      WINDOW w AS (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT day, cents,
           CAST(cum_dev - LEAST(MIN(cum_dev) OVER w2, 0) AS BIGINT)
             AS cusum_scaled,
           CAST(cum_dev - LEAST(MIN(cum_dev) OVER w2, 0) AS DOUBLE)
             / CAST(n AS DOUBLE) AS cusum_cents
    FROM cs
    WINDOW w2 AS (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_cusum_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper CUSUM control chart on daily revenue: the sequential
    changepoint statistic S_t = max(0, S_{t−1} + (x_t − μ)) — a
    RECURSION no window frame expresses directly — unrolled via the
    identity S_t = C_t − min(0, min_{j≤t} C_j) where C is the plain
    cumulative deviation sum.  Deviations are scaled by n (x_t·n −
    Σx) so the mean never becomes a ratio: the whole chart is BIGINT
    until one final division.  A sustained upward level shift makes
    S_t climb; in-control noise keeps it pinned near zero — the chart
    quality teams actually watch, with the alarm threshold applied
    downstream.

    100 TB: facts collapse to the day grain first; both windows run
    over the tiny aggregated series.  The same identity turns ANY
    max(0, recursive-sum) statistic (drawdown, queue depth, leaky
    bucket) into two windows — the general declarative escape from
    one-step recursions.  BIGINT headroom: cents·n·days ≈ 5·10¹⁶ at
    sf1-scale revenue; rescale the quantum (cents → whole units)
    before the product nears 2⁶³."""
    d = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("total"),
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cs = d.crossJoin(tot).select(
        "day",
        "cents",
        F.sum(F.col("cents") * F.col("n") - F.col("total"))
        .over(w)
        .cast("bigint")
        .alias("cum_dev"),
        "n",
    )
    floor_min = F.least(F.min("cum_dev").over(w), F.lit(0))
    return cs.select(
        "day",
        "cents",
        (F.col("cum_dev") - floor_min).cast("bigint").alias("cusum_scaled"),
        (
            (F.col("cum_dev") - floor_min).cast("double")
            / F.col("n").cast("double")
        ).alias("cusum_cents"),
    )
