"""Analytics tier XXXIII: survival analysis, joint distributions,
quantile-threshold filters.

New shapes over I-XXXII: a repurchase survival curve (share of
inter-order gaps exceeding each horizon — the Kaplan-Meier-flavored
retention table, here over complete gaps so it is exact counting),
a joint quartile contingency (basket size × order value — the
bivariate distribution table univariate ntiles can't show), and a
quantile-threshold filter (customers above their own segment's p90
balance — compute the group threshold, broadcast it back, filter:
the canonical "top decile of their peer group" selection).

Cross-engine exactness: survival shares and contingency cells are
IEEE divisions of exact integer counts; quartiles and the p90 use
ntile/order-statistic picks under total orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_HORIZONS = [7, 30, 90, 365]


@register(
    "q_survival_curve",
    oracle=f"""
    WITH g AS (
      SELECT date_diff('day',
                       LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate,
                                                       o_orderkey),
                       o_orderdate) AS gap_days
      FROM orders
    ),
    gaps AS (SELECT gap_days FROM g WHERE gap_days IS NOT NULL),
    h AS (SELECT UNNEST(ARRAY{_HORIZONS}) AS horizon_days)
    SELECT h.horizon_days,
           (SELECT COUNT(*) FROM gaps) AS n_gaps,
           CAST(SUM(CASE WHEN g.gap_days > h.horizon_days
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_surviving,
           CAST(CAST(SUM(CASE WHEN g.gap_days > h.horizon_days
                              THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM gaps) AS DOUBLE)
             AS survival_share
    FROM h CROSS JOIN gaps g
    GROUP BY h.horizon_days
    """,
)
def q_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repurchase survival curve: for each horizon, the share of
    inter-order gaps that exceed it — "what fraction of customers
    haven't returned after t days" over COMPLETE gaps (every gap here
    has an observed next order, so no censoring correction is needed
    and the curve is exact counting; true Kaplan-Meier adds censored
    open intervals with the same aggregation shape).

    100 TB: the gap table is the one shuffle (per-customer lag); the
    horizon table is {len(_HORIZONS)} literal rows cross-joined in —
    each survival point is a conditional count over the same pass,
    never a re-scan per horizon."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        load(spark, sf_dir, "orders")
        .select(
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ).alias("gap_days")
        )
        .filter(F.col("gap_days").isNotNull())
    )
    n_gaps = gaps.count()
    horizons = spark.createDataFrame(
        [(h,) for h in _HORIZONS], "horizon_days int"
    )
    return (
        horizons.crossJoin(gaps)
        .groupBy("horizon_days")
        .agg(
            F.lit(n_gaps).cast("bigint").alias("n_gaps"),
            F.count_if(F.col("gap_days") > F.col("horizon_days"))
            .cast("bigint")
            .alias("n_surviving"),
            (
                F.count_if(F.col("gap_days") > F.col("horizon_days"))
                .cast("bigint")
                .cast("double")
                / F.lit(float(n_gaps))
            ).alias("survival_share"),
        )
    )


@register(
    "q_quartile_contingency",
    oracle="""
    WITH b AS (
      SELECT l_orderkey, COUNT(*) AS basket_lines
      FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
      SELECT o.o_orderkey, b.basket_lines, o.o_totalprice
      FROM orders o JOIN b ON b.l_orderkey = o.o_orderkey
    ),
    q AS (
      SELECT o_orderkey,
             CAST(ntile(4) OVER (ORDER BY basket_lines, o_orderkey)
                  AS INTEGER) AS size_quartile,
             CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey)
                  AS INTEGER) AS value_quartile
      FROM j
    )
    SELECT size_quartile, value_quartile, COUNT(*) AS n_orders
    FROM q GROUP BY 1, 2
    """,
)
def q_quartile_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint quartile contingency: orders cross-classified by basket-
    size quartile × value quartile — the bivariate table that reveals
    whether big baskets ARE the big orders (diagonal mass) or not
    (off-diagonal), which two separate univariate ntile reports can't
    show. Both ntiles carry the orderkey tiebreak for total order.

    PRODUCTION PLAN: both quartile assignments run through the
    boundary-cut exact global ntile (operators/ranks.py) — two
    percentile probes become literal cuts, local windows stay
    balanced per bucket, and the closed-form NTILE arithmetic is
    bit-equal to the window form under each total order (basket_lines
    ties collapse to ≤ |distinct sizes| buckets, each a bounded
    fraction of orders).  NTILE twin below pytest-pinned; oracle
    unchanged."""
    from lakehouse_ecommerce_etl_pipeline_spark.operators.ranks import (
        RankSpec,
        with_global_ntiles,
    )

    b = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("basket_lines"))
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    j = b.join(o, "l_orderkey")
    # both quartile axes are independent orders of the same order-
    # grain rows: ONE multi-ntile call shares the probe/counts
    # actions.  basket_lines has ~7 distinct values — every value a
    # fat tie class at scale — so its dim auto-splits on the unique
    # order key.
    j = with_global_ntiles(
        j,
        [
            RankSpec(["basket_lines", "l_orderkey"], primary="basket_lines",
                     rn="size_quartile", secondary="l_orderkey", k=4),
            RankSpec(["o_totalprice", "l_orderkey"], primary="o_totalprice",
                     rn="value_quartile", secondary="l_orderkey", k=4),
        ],
    )
    return (
        j.select(
            F.col("size_quartile").cast("int").alias("size_quartile"),
            F.col("value_quartile").cast("int").alias("value_quartile"),
        )
        .groupBy("size_quartile", "value_quartile")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def q_quartile_contingency_window_form(spark: SparkSession, sf_dir: str):
    """NTILE oracle-exactness twin (former production plan),
    pytest-pinned equal to the boundary-cut form."""
    b = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("basket_lines"))
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    j = b.join(o, "l_orderkey")
    size_q = F.ntile(4).over(Window.orderBy("basket_lines", "l_orderkey"))
    value_q = F.ntile(4).over(Window.orderBy("o_totalprice", "l_orderkey"))
    return (
        j.select(
            size_q.cast("int").alias("size_quartile"),
            value_q.cast("int").alias("value_quartile"),
        )
        .groupBy("size_quartile", "value_quartile")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q_above_p90_customers",
    oracle="""
    WITH r AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal, c_custkey) AS rk,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM customer
    ),
    thr AS (
      SELECT c_mktsegment, c_acctbal AS p90_threshold
      FROM r WHERE rk = CEIL(0.9 * n)
    )
    SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal, t.p90_threshold
    FROM customer c JOIN thr t USING (c_mktsegment)
    WHERE c.c_acctbal > t.p90_threshold
    """,
)
def q_above_p90_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-threshold filter: customers strictly above their own
    segment's p90 balance — compute the per-group threshold (the
    exact discrete p90, q_kth_order_statistic's pick), broadcast the
    5-row threshold table back, filter. The canonical "top of their
    peer group" selection, done as threshold-join rather than
    rank-per-row so the fact pass stays window-free.

    100 TB: the threshold table is |groups| rows however big the data
    — the filter is a broadcast join + pushed predicate; only the
    threshold computation sorts, and it swaps to two-phase selection
    at scale."""
    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    r = cust.select(
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("c_mktsegment"))
        .alias("n"),
    )
    thr = r.filter(
        F.col("rk") == F.ceil(F.lit(0.9) * F.col("n"))
    ).select(
        "c_mktsegment", F.col("c_acctbal").alias("p90_threshold")
    )
    return (
        cust.join(F.broadcast(thr), "c_mktsegment")
        .filter(F.col("c_acctbal") > F.col("p90_threshold"))
        .select("c_custkey", "c_mktsegment", "c_acctbal", "p90_threshold")
    )


@register(
    "q_new_vs_returning",
    oracle="""
    WITH first_order AS (
      SELECT o_custkey, MIN(o_orderdate) AS first_date
      FROM orders GROUP BY o_custkey
    )
    SELECT CAST(o.o_orderdate AS DATE) AS day,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN o.o_orderdate = f.first_date
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN o.o_orderdate <> f.first_date
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_returning,
           CAST(SUM(CASE WHEN o.o_orderdate = f.first_date
                         THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS new_share
    FROM orders o JOIN first_order f USING (o_custkey)
    GROUP BY 1
    """,
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning daily mix: each order labeled by whether it
    falls on its customer's first-ever order date, rolled up to the
    daily acquisition share — the growth-accounting split every
    revenue dashboard leads with. The label is exact date equality
    against a per-customer MIN; the share is one IEEE division of
    exact counts.

    100 TB: the first-order table is one map-side-combined aggregate
    co-partitioned with the fact join on o_custkey (one exchange
    serves both); the daily rollup collapses to the day domain.
    Same-day multiple first orders all count as new — consistent on
    both engines because the rule is date equality, not rank."""
    o = load(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_date")
    )
    is_new = (F.col("o_orderdate") == F.col("first_date")).cast("int")
    return (
        o.join(first, "o_custkey")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(is_new).cast("bigint").alias("n_new"),
            F.sum(1 - is_new).cast("bigint").alias("n_returning"),
            (
                F.sum(is_new).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("new_share"),
        )
    )
