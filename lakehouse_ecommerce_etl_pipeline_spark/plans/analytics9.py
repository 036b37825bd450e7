"""Analytics tier IX: time-series gap-fill with LOCF, and Z-order
clustering statistics.

Cross-engine exactness: hour buckets come from integer micros
division (`unix_micros(ts) div 3.6e9` ↔ `epoch_us(ts) // 3.6e9` —
per the RANGE-frame rule, never interval arithmetic); hourly sums are
DECIMAL-exact before the cast to double, and LOCF only *carries*
already-exact values; Z-values are pure integer bit arithmetic.

Reference parity: the reference has no time-series tier (its events
exist only as Step Function triggers); gap-fill/LOCF is the
hypertable-rollup capability its Athena analytics zone would need for
dashboard-continuous series. Z-ORDER is claimed by the reference
without code (README.md:119,137) — operators/zorder.py implements it
for real, and q_zorder_stats proves the clustering property.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.operators.zorder import (
    zvalue_column,
    zvalue_sql,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_US_PER_HOUR = 3_600_000_000


@register(
    "q_gapfill_locf",
    oracle=f"""
    WITH hourly AS (
      SELECT user_id, epoch_us(ts) // {_US_PER_HOUR} AS h,
             COUNT(*) AS n_obs,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS hsum
      FROM events GROUP BY user_id, h
    ),
    spans AS (
      SELECT user_id, MIN(h) AS hmin, MAX(h) AS hmax FROM hourly
      GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(hmin, hmax)) AS h FROM spans
    )
    SELECT g.user_id,
           CAST(g.h AS BIGINT) AS hour_bucket,
           CAST(COALESCE(hourly.n_obs, 0) AS BIGINT) AS n_obs,
           last_value(hourly.hsum IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM grid g LEFT JOIN hourly USING (user_id, h)
    """,
)
def q_gapfill_locf(spark, sf_dir):
    """Dense per-user hourly series with last-observation-carried-
    forward: bucket events to hours, build each user's full hour grid
    (sequence + explode), left-join observed hourly sums, and fill
    gaps with the latest prior value — the TimescaleDB
    `time_bucket_gapfill` + `locf` capability as pure DataFrame ops.

    100 TB: the grid is generated per user-span (no driver loop, no
    cross join against a global calendar), so grid size is
    O(users × active-span), not O(users × total-span). The only wide
    operations are the hourly pre-aggregation (map-side combinable)
    and one partition-local window per user; sequence+explode is
    narrow. Buckets are BIGINT epoch-hours from integer micros
    division — exact, and a monotonic sort/partition key."""
    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "user_id",
            F.expr(f"unix_micros(ts) div {_US_PER_HOUR}").alias("h"),
            "value",
        )
        .groupBy("user_id", "h")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            (
                F.sum(F.round(F.col("value") * 100).cast("bigint")).cast(
                    "double"
                )
                / F.lit(100.0)
            ).alias("hsum"),
        )
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("hmin"), F.max("h").alias("hmax"))
        .select(
            "user_id",
            F.explode(F.sequence("hmin", "hmax")).alias("h"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "h"], "left")
        .select(
            "user_id",
            F.col("h").cast("bigint").alias("hour_bucket"),
            F.coalesce("n_obs", F.lit(0)).cast("bigint").alias("n_obs"),
            F.last("hsum", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


@register(
    "q_zorder_stats",
    oracle=f"""
    WITH z AS (
      SELECT (l_partkey & 1023) AS x, (l_suppkey & 1023) AS y,
             ({zvalue_sql("l_partkey & 1023", "l_suppkey & 1023", 10)}) AS zval
      FROM lineitem
    )
    SELECT CAST(zval >> 12 AS BIGINT) AS file_id,
           COUNT(*) AS n_rows,
           CAST(MIN(x) AS BIGINT) AS x_min, CAST(MAX(x) AS BIGINT) AS x_max,
           CAST(MIN(y) AS BIGINT) AS y_min, CAST(MAX(y) AS BIGINT) AS y_max
    FROM z GROUP BY file_id ORDER BY file_id
    """,
)
def q_zorder_stats(spark, sf_dir):
    """Morton-code clustering assignment + the per-file min/max column
    statistics a reader's data-skipping uses. Each `file_id` (top Z
    bits) covers a compact square of the (x, y) grid, so BOTH x and y
    bounding ranges stay narrow — the two-dimensional pruning property
    linear sort order cannot give.

    100 TB: these min/max stats are exactly what parquet footers /
    Delta file stats store; a predicate `x BETWEEN a AND b AND y
    BETWEEN c AND d` prunes to the few files whose box intersects.
    The Z-value itself is codegen'd integer bit math — no UDF."""
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_partkey").bitwiseAND(1023)
    y = F.col("l_suppkey").bitwiseAND(1023)
    return (
        li.select(
            x.alias("x"),
            y.alias("y"),
            zvalue_column(x, y, 10).alias("zval"),
        )
        .groupBy(F.shiftright("zval", 12).cast("bigint").alias("file_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").cast("bigint").alias("x_min"),
            F.max("x").cast("bigint").alias("x_max"),
            F.min("y").cast("bigint").alias("y_min"),
            F.max("y").cast("bigint").alias("y_max"),
        )
        .orderBy("file_id")
    )
