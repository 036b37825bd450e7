"""Analytics tier XXXIX: stateful sequential scans and forecast
backtesting.

New shapes over I-XXXVIII: a CAPPED running balance — the recurrence
b_t = clamp(b_{t-1} + a_t, 0, cap) is NOT expressible with window
frames (the clamp makes each step depend on the clamped previous
step), so it runs as a per-group vectorized sequential scan in
applyInPandas and is oracled with a recursive CTE — the pattern for
inventory levels, credit limits, token-bucket rate limits, and any
bounded accumulator; and a walk-forward forecast backtest (naive vs
seasonal-naive daily revenue, per-model MAE over the common horizon)
— the model-evaluation table every forecasting pipeline emits.

Cross-engine exactness: balances are integer arithmetic end to end;
backtest errors are |differences of identical doubles| quantized to
DECIMAL before the associative sum.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_CAP = 50_000


@register(
    "q_capped_running_balance",
    oracle=f"""
    WITH RECURSIVE base AS (
      SELECT o_custkey,
             o_orderkey,
             CAST(CASE WHEN o_orderkey % 3 = 0
                       THEN -floor(o_totalprice)
                       ELSE floor(o_totalprice) END AS BIGINT) AS amount,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    bal AS (
      SELECT o_custkey, o_orderkey, amount, rn,
             GREATEST(0, LEAST({_CAP}, amount)) AS balance
      FROM base WHERE rn = 1
      UNION ALL
      SELECT s.o_custkey, s.o_orderkey, s.amount, s.rn,
             GREATEST(0, LEAST({_CAP}, b.balance + s.amount)) AS balance
      FROM base s JOIN bal b
        ON s.o_custkey = b.o_custkey AND s.rn = b.rn + 1
    )
    SELECT o_custkey, o_orderkey, amount, balance FROM bal
    """,
)
def q_capped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped running balance per customer: deposits/withdrawals
    (sign from o_orderkey % 3, integer-floored amounts) accumulate in
    order-date order under b_t = clamp(b_{t-1} + a_t, 0, cap).  The
    clamp breaks the prefix-sum algebra — no window frame computes
    this — so each customer's history runs as a sequential scan in
    Python, and the oracle replays the identical recurrence as a
    recursive CTE.  This is the bounded-accumulator pattern:
    inventory on hand, credit headroom, token-bucket rate limiting.

    Plan shape: hash-partition by customer, sort within partitions by
    (customer, date, orderkey), then ONE mapInPandas pass per
    partition with carry state across Arrow batches — the r3 form was
    groupBy().applyInPandas, which invokes the Python worker once per
    GROUP (~15k tiny calls at sf0.1, 22 s); the partition-level scan
    makes it #partitions calls (measured ~20×).

    100 TB: groups scan independently (one shuffle on the group key);
    within a group the recurrence is inherently sequential, so the
    scalability axis is #groups × group length — for million-event
    single keys, segment the timeline and stitch via the clamp's
    absorbing states (balance pinned at 0 or cap resets dependence).
    All-integer state makes the scan bit-exact under retries."""
    base = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.when(
            F.col("o_orderkey") % 3 == 0, -F.floor("o_totalprice")
        )
        .otherwise(F.floor("o_totalprice"))
        .cast("bigint")
        .alias("amount"),
    )

    out_schema = T.StructType(
        [
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("amount", T.LongType()),
            T.StructField("balance", T.LongType()),
        ]
    )

    def scan(batches):
        prev_key = None
        bal = 0
        for pdf in batches:
            out = []
            for ck, amt in zip(pdf["o_custkey"], pdf["amount"]):
                if ck != prev_key:
                    prev_key = ck
                    bal = 0
                bal = max(0, min(_CAP, bal + int(amt)))
                out.append(bal)
            yield pdf.assign(balance=out)[
                ["o_custkey", "o_orderkey", "amount", "balance"]
            ]

    # rows of one customer must share a partition and arrive in order;
    # Arrow batches preserve partition order, the carry state bridges
    # batch boundaries
    return (
        base.repartition("o_custkey")
        .sortWithinPartitions("o_custkey", "o_orderdate", "o_orderkey")
        .mapInPandas(scan, schema=out_schema)
    )


@register(
    "q_backtest_seasonal_naive",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS DOUBLE) / 100.0 AS revenue
      FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    preds AS (
      SELECT d, revenue,
             lag(revenue, 1) OVER (ORDER BY d) AS pred_naive,
             lag(revenue, 7) OVER (ORDER BY d) AS pred_seasonal
      FROM daily
    ),
    eval AS (SELECT * FROM preds
             WHERE pred_naive IS NOT NULL
               AND pred_seasonal IS NOT NULL)
    SELECT model,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(err) AS DOUBLE) AS total_abs_err
    FROM (
      SELECT 'naive_1d' AS model,
             CAST(abs(revenue - pred_naive) AS DECIMAL(25,6)) AS err
      FROM eval
      UNION ALL
      SELECT 'seasonal_7d' AS model,
             CAST(abs(revenue - pred_seasonal) AS DECIMAL(25,6)) AS err
      FROM eval
    )
    GROUP BY model
    """,
)
def q_backtest_seasonal_naive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Walk-forward forecast backtest: daily revenue predicted by the
    1-day naive and the 7-day seasonal-naive baselines, scored by
    total absolute error over the days where BOTH models have a
    prediction (identical evaluation spans — the backtesting rule
    every leaderboard gets wrong first).  These two baselines are the
    floor any real forecaster must beat; the harness shape (lag
    features → common-span filter → per-model error rollup) is the
    capability.

    100 TB: the daily rollup collapses facts before any window runs
    (never lag over raw facts); per-model errors are one conditional
    pass, decimal-quantized so the MAE reduction is associative and
    partition-exact."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            (
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("bigint")
                ).cast("double")
                / F.lit(100.0)
            ).alias("revenue")
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("d")
    preds = daily.select(
        "d",
        "revenue",
        F.lag("revenue", 1).over(w).alias("pred_naive"),
        F.lag("revenue", 7).over(w).alias("pred_seasonal"),
    ).filter(
        F.col("pred_naive").isNotNull()
        & F.col("pred_seasonal").isNotNull()
    )
    naive = preds.select(
        F.lit("naive_1d").alias("model"),
        F.abs(F.col("revenue") - F.col("pred_naive"))
        .cast("decimal(25,6)")
        .alias("err"),
    )
    seasonal = preds.select(
        F.lit("seasonal_7d").alias("model"),
        F.abs(F.col("revenue") - F.col("pred_seasonal"))
        .cast("decimal(25,6)")
        .alias("err"),
    )
    return (
        naive.unionByName(seasonal)
        .groupBy("model")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("err").cast("double").alias("total_abs_err"),
        )
    )
