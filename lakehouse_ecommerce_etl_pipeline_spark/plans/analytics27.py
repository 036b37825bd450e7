"""Analytics tier XXVII: SQL-surface robustness — error-safe
arithmetic, schema-on-read string parsing, calendar spines.

New shapes over I-XXVI: TRY-arithmetic (try_divide/try_to_number —
NULL instead of error, the semantics an ANSI-mode pipeline needs at
its dirty edges), from_csv schema-on-read parsing of an embedded
delimited string column (the "CSV inside a column" pattern of log and
export ingestion), and a generated calendar spine left-joined with
zero-fill (dense daily revenue including empty days — the
complementary shape to q_gapfill_locf, which carries values forward
instead of filling zeros).

Cross-engine exactness: TRY results are NULL-or-exact; the spine is
integer date arithmetic (sequence/generate_series agree on closed
bounds); zero-fill uses COALESCE over decimal-exact sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lakehouse_ecommerce_etl_pipeline_spark.operators.aggregates import (
    dsum,
    sql_dsum,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


@register(
    "q_try_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN (o_orderkey % 10) = 0 THEN NULL
                ELSE o_totalprice / CAST(o_orderkey % 10 AS DOUBLE)
           END AS safe_ratio,
           CASE WHEN o_orderstatus IN ('0','1','2','3','4','5','6','7','8','9')
                THEN CAST(o_orderstatus AS BIGINT) ELSE NULL
           END AS status_as_number
    FROM orders
    """,
)
def q_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic: try_divide turns division-by-zero into
    NULL (a denominator synthesized as o_orderkey % 10, zero on every
    10th row) and try_cast turns an unparseable string into NULL
    instead of an ANSI runtime error — the semantics that let a
    pipeline survive dirty rows without disabling ANSI mode globally.
    The oracle states the same semantics as explicit CASE guards.

    100 TB: identical plan shape to the unsafe versions (pure
    projection, full codegen); the value is operational — one poisoned
    row cannot fail a 10-hour job. Pair with the quarantine sink
    (q_rejected_records) to route the NULLs out."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.try_divide(
            F.col("o_totalprice"),
            (F.col("o_orderkey") % 10).cast("double"),
        ).alias("safe_ratio"),
        F.col("o_orderstatus").try_cast(T.LongType()).alias(
            "status_as_number"
        ),
    )


@register(
    "q_from_csv_parse",
    oracle="""
    WITH lines AS (
      SELECT o_orderkey,
             CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus || '|'
               || CAST(o_totalprice AS VARCHAR) AS csv_line
      FROM orders
    )
    SELECT o_orderkey,
           CAST(string_split(csv_line, '|')[1] AS BIGINT) AS k,
           string_split(csv_line, '|')[2] AS status,
           CAST(string_split(csv_line, '|')[3] AS DOUBLE) AS price
    FROM lines
    """,
)
def q_from_csv_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read parsing of an embedded delimited string column
    with ``from_csv`` (the "CSV inside a column" pattern: log lines,
    legacy exports, Kafka payloads). The line is synthesized from
    orders so the parse is oracle-checkable: Spark writes doubles as
    shortest-roundtrip strings and DuckDB parses them back to the
    identical binary double, so the value round-trip is lossless on
    both engines.

    100 TB: from_csv is a codegen'd projection — schema-on-read
    without a second scan or a Python UDF; malformed lines surface as
    NULL structs that route to quarantine like any TRY failure."""
    lines = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            "o_orderstatus",
            F.col("o_totalprice").cast("string"),
        ).alias("csv_line"),
    )
    parsed = lines.select(
        "o_orderkey",
        F.from_csv(
            "csv_line",
            "k BIGINT, status STRING, price DOUBLE",
            {"sep": "|"},
        ).alias("p"),
    )
    return parsed.select("o_orderkey", "p.k", "p.status", "p.price")


@register(
    "q_date_spine_zero_fill",
    oracle=f"""
    WITH bounds AS (
      SELECT CAST(MIN(o_orderdate) AS DATE) AS d0,
             CAST(MAX(o_orderdate) AS DATE) AS d1
      FROM orders
    ),
    spine AS (
      SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM bounds
    ),
    rev AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             COUNT(*) AS n_orders,
             {sql_dsum("o_totalprice", "revenue")}
      FROM orders GROUP BY 1
    )
    SELECT s.day,
           COALESCE(r.n_orders, 0) AS n_orders,
           COALESCE(r.revenue, CAST(0 AS DOUBLE)) AS revenue
    FROM spine s LEFT JOIN rev r USING (day)
    """,
)
def q_date_spine_zero_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily revenue over a generated calendar spine
    (sequence(min_day, max_day) exploded), zero-filled where no order
    landed — the report-grade timeline where absence must read as 0,
    not as a missing row (the complement of q_gapfill_locf's
    carry-forward). Bounds are closed on both engines; sums are
    decimal-exact before COALESCE.

    100 TB: the spine is O(days) — generated, never scanned; the
    aggregate collapses facts to the day grain before the join, so
    the left join is spine-sized. Generate-join-coalesce beats any
    windowed gap trick when the fill value is a constant."""
    o = load(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.to_date("o_orderdate")).alias("d0"),
        F.max(F.to_date("o_orderdate")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    rev = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "revenue"),
    )
    return spine.join(rev, "day", "left").select(
        "day",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
    )
