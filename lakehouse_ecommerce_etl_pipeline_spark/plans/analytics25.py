"""Analytics tier XXV: sliding windows, batch session windows,
hierarchy shares, power-law histograms, discrete order statistics.

New shapes over I-XXIV: streaming sliding-window aggregation (the
overlapping-assignment variant of the tumbling twin, with the
two-assignment union as its exact batch oracle), batch
``session_window`` (the gap-merge API outside streaming — Spark's
native sessionizer vs the lag-cumsum build of q_sessionize),
percent-of-parent hierarchy shares (nation within region),
log2-bucketed power-law histograms (floor(log2) is boundary-exact on
integers: both engines are exact at powers of two, and a sub-ulp
libm difference cannot cross a floor boundary anywhere else), and
discrete (nearest-element) per-group quantiles — the p90 as the
ceil(p·n)-th order statistic, an integer-index pick rather than
interpolation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.operators.aggregates import (
    dsum,
    sql_dsum,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import (
    events_parquet_path,
    load,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register
from lakehouse_ecommerce_etl_pipeline_spark.streaming.windows import (
    sliding_agg_stream,
)


# ------------------------------------------- streaming sliding window


@register(
    "q_stream_sliding_agg",
    oracle="""
    WITH assigned AS (
      SELECT date_trunc('hour', ts) AS window_start, event_type, value
      FROM events
      UNION ALL
      SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type, value
      FROM events
    )
    SELECT window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_value
    FROM assigned GROUP BY window_start, event_type
    """,
)
def q_stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming sliding-window aggregation (2 h windows
    sliding hourly — every event counted in exactly two windows),
    drained availableNow and checked against the batch oracle that
    materializes both hour-aligned assignments explicitly. Stream ≡
    batch over OVERLAPPING windows is the parity being proved;
    q_stream_tumbling_agg covers the disjoint case."""
    return sliding_agg_stream(spark, events_parquet_path(spark, sf_dir))


# ------------------------------------------------ batch session window


@register(
    "q_batch_session_window",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 20 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ),
    s AS (
      SELECT user_id, ts, value,
             CAST(SUM(is_start) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_id
      FROM g
    )
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 20 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_value
    FROM s GROUP BY user_id, session_id
    """,
)
def q_batch_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-merged sessions via Spark's native ``session_window`` in a
    BATCH aggregation (20 min gap): the declarative sessionizer whose
    window end extends gap past the last event — checked against the
    independent lag-gap-island construction (the same oracle shape
    q_sessionize builds by hand, which is the point: API and manual
    build must agree).

    100 TB: one shuffle on user_id; session merging happens inside
    the aggregation — no state store in batch mode, so the only
    scale knob is key skew (salt power users)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "20 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


# -------------------------------------------------- percent of parent


@register(
    "q_percent_of_parent",
    oracle=f"""
    WITH nat AS (
      SELECT n.n_regionkey, c.c_nationkey,
             {sql_dsum("o.o_totalprice", "nation_revenue")},
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS nation_cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_regionkey, c.c_nationkey
    )
    SELECT r.r_name AS region, n.n_name AS nation, nat.nation_revenue,
           CAST(CAST(SUM(nat.nation_cents)
                     OVER (PARTITION BY nat.n_regionkey) AS BIGINT)
                AS DOUBLE) / 100.0 AS region_revenue,
           nat.nation_revenue /
           (CAST(CAST(SUM(nat.nation_cents)
                      OVER (PARTITION BY nat.n_regionkey) AS BIGINT)
                 AS DOUBLE) / 100.0) AS share_of_region
    FROM nat
    JOIN nation n ON n.n_nationkey = nat.c_nationkey
    JOIN region r ON r.r_regionkey = nat.n_regionkey
    """,
)
def q_percent_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent in the geography hierarchy: each nation's
    revenue share within its region. Nation revenues ride the BIGINT
    integer-cents lattice (DESIGN §21 rule 3); the region total sums
    the child CENTS (exact int64, associative — never re-quantizes a
    double), and the share is one IEEE division of two identical
    doubles.

    100 TB: the fact aggregate shuffles once on (region, nation) — a
    tiny grouped domain after the broadcast dimension joins; the
    percent-of-parent window runs over ≤|nations| rows. The general
    BI pattern: aggregate to the child grain FIRST, window over the
    parent grain SECOND — never window over facts."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    nat = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
        .groupBy("n_regionkey", "c_nationkey")
        .agg(
            dsum("o_totalprice", "nation_revenue"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("nation_cents"),
        )
    )
    region_total = (
        F.sum(F.col("nation_cents"))
        .over(Window.partitionBy("n_regionkey"))
        .cast("bigint")
        .cast("double")
        / F.lit(100.0)
    )
    return (
        nat.join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(r),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            "nation_revenue",
            region_total.alias("region_revenue"),
            (F.col("nation_revenue") / region_total).alias(
                "share_of_region"
            ),
        )
    )


# --------------------------------------------------- log2 histogram


@register(
    "q_log2_histogram",
    oracle="""
    WITH c AS (
      SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT CAST(floor(log2(cents)) AS BIGINT) AS log2_bucket,
           COUNT(*) AS n_orders,
           MIN(cents) AS min_cents,
           MAX(cents) AS max_cents
    FROM c WHERE cents > 0
    GROUP BY 1
    """,
)
def q_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law profile of order values: log2-bucketed cent
    histogram (bucket k holds [2^k, 2^(k+1))). floor(log2) over
    integers is engine-exact: at powers of two log2 is exactly k in
    IEEE, and everywhere else a sub-ulp libm difference cannot move
    log2(x) across an integer — the only boundary floor cares about.
    The doubling buckets are what you profile before choosing
    histogram bin widths, salting thresholds, and skew cutoffs.

    100 TB: one map-side-combined aggregate over ~60 buckets — the
    cheapest possible distribution sketch of a heavy-tailed column."""
    c = load(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
    )
    return (
        c.filter(F.col("cents") > 0)
        .groupBy(
            F.floor(F.log2("cents")).cast("bigint").alias("log2_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )


# ------------------------------------------- discrete order statistic


_P_DISC = 0.9


@register(
    "q_kth_order_statistic",
    oracle=f"""
    WITH r AS (
      SELECT c_mktsegment, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal, c_custkey) AS rk,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM customer
    )
    SELECT c_mktsegment, n,
           CAST(CEIL({_P_DISC} * n) AS BIGINT) AS k,
           c_acctbal AS p90_acctbal
    FROM r WHERE rk = CEIL({_P_DISC} * n)
    """,
)
def q_kth_order_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete (nearest-element) per-group quantile: the p90 account
    balance per segment as the ceil(p·n)-th order statistic — an
    integer-index pick under a total (value, key) order, complementing
    the interpolating q_percentile (PERCENTILE_DISC vs
    PERCENTILE_CONT). ceil(0.9·n) is exact: 0.9·n has one IEEE
    product for identical n, and ceil moves with >14 significant
    digits of margin at any realistic group size.

    100 TB: the rank is a per-segment window sort; for heavy groups
    swap in the two-phase selection of q_quantile_bucket_assign
    (range-partition by value, accumulate counts, descend into the
    crossing range) — exact selection without a full sort."""
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    r = load(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("c_mktsegment"))
        .alias("n"),
    )
    k = F.ceil(F.lit(_P_DISC) * F.col("n")).cast("bigint")
    return r.filter(F.col("rk") == k).select(
        "c_mktsegment",
        "n",
        k.alias("k"),
        F.col("c_acctbal").alias("p90_acctbal"),
    )
