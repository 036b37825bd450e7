"""Analytics tier VI: value-range window frames and embedding
quantization — the two remaining frame/vector shapes.

Cross-engine exactness: the trailing-hour frame orders by integer
microsecond epochs (``unix_micros`` / ``epoch_us``) because interval
RANGE frames over fractional-second timestamps round differently per
engine; quantization uses FLOOR (never ROUND — HALF_UP vs banker's
ties diverge) and casts float[] → double[] before arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


@register(
    "q_window_time_range",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 100.0 AS trailing_1h_value
    FROM events
    """,
)
def q_window_time_range(spark, sf_dir):
    """Trailing one-hour sum per user — a RANGE (value-based) window
    frame, distinct from the ROWS frames elsewhere in the corpus: the
    frame extends to every peer within 3.6e9 microseconds, however
    many rows that is. Exact int64 cents accumulation under the
    frame (DESIGN §21 rule 3).

    Scale: partitions by user (high cardinality) — one shuffle, then
    a per-key sort the range frame scans once with two pointers; no
    self-join of events against itself (the naive time-join encoding
    of the same query)."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        (
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .over(w)
            .cast("double")
            / F.lit(100.0)
        ).alias("trailing_1h_value"),
    )


@register(
    "q_embedding_quantize",
    oracle="""
    WITH vecs AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), scaled AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) AS max_abs
      FROM vecs
    )
    SELECT vec_id,
           CAST(max_abs AS DOUBLE) AS max_abs,
           array_to_string(
             CASE WHEN max_abs = 0
                  THEN list_transform(v, x -> CAST(0 AS INTEGER))
                  ELSE list_transform(v, x -> CAST(FLOOR(x / max_abs * 127)
                                                   AS INTEGER))
             END, ',') AS q_csv
    FROM scaled
    """,
)
def q_embedding_quantize(spark, sf_dir):
    """Int8-style scalar quantization of the embedding column: each
    vector is scaled by its own max-|x| and floored onto the
    [-127, 127] integer grid — the compression step before shipping
    vectors to an ANN index. FLOOR (not ROUND) keeps ties impossible
    and the grid exact on both engines.

    Scale: pure per-row array arithmetic inside codegen — no shuffle,
    no UDF; 4× smaller vectors into every downstream join/index."""
    emb = load(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    quantized = F.when(
        F.col("max_abs") == 0,
        F.transform(F.col("v"), lambda x: F.lit(0).cast("int")),
    ).otherwise(
        F.transform(
            F.col("v"),
            lambda x: F.floor(x / F.col("max_abs") * 127).cast("int"),
        )
    )
    return (
        emb.select(F.col("vec_id"), v.alias("v"))
        .withColumn(
            "max_abs", F.array_max(F.transform(F.col("v"), lambda x: F.abs(x)))
        )
        .select(
            "vec_id",
            F.col("max_abs").cast("double").alias("max_abs"),
            # serialized — int arrays join exactly; keeps the driver's
            # value hash on scalar strings rather than nested lists
            F.array_join(quantized, ",").alias("q_csv"),
        )
    )


@register(
    "q_window_rank_fns",
    oracle="""
    SELECT c_custkey,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def q_window_rank_fns(spark, sf_dir):
    """The remaining rank-family window functions — NTILE bucketing,
    PERCENT_RANK, CUME_DIST — per market segment with a total order
    (custkey tiebreak). All three are ratios of exact integers
    ((rank-1)/(n-1), rank/n), so the doubles agree bit-for-bit
    cross-engine; no rounding needed."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "q_histogram",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders
    GROUP BY 1 ORDER BY bucket
    """,
)
def q_histogram(spark, sf_dir):
    """Fixed-width histogram of order totals (50k-wide buckets):
    FLOOR-based bucket assignment — the same double division on both
    engines, no ROUND ties — with per-bucket counts and extrema.
    Map-side combinable; bucket count is bounded by the value range,
    so the shuffle is tiny at any scale."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000.0).cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
        .orderBy("bucket")
    )
