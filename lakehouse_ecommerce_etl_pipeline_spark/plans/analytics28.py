"""Analytics tier XXVIII: migration fingerprints, session funnels,
feature standardization.

New shapes over I-XXVII: an order-insensitive table checksum (the
migration/replication validation fingerprint: canonical row rendering
→ md5 → 56-bit integer → associative sum — the cheapest "did the copy
match" proof that needs no row-by-row diff), session-level conversion
rates by entry channel (the session-grain rollup of the sessionizer —
events → sessions → channel economics), and per-dimension z-score
standardization of the embedding table (the feature-scaling pass
before any distance-based model, posexplode → per-dimension moments →
long-form z-scores).

Cross-engine exactness: md5 and hex→int agree by construction (Spark
conv(,16,10) vs DuckDB CAST('0x…')); doubles render shortest-
roundtrip identically on both engines (proven by q_from_csv_parse);
dates render through explicit formats; the z-score divides identical
IEEE doubles derived from decimal-exact moment sums whose INTERNAL
integers stay below 2^53 (DECIMAL(14,6) value / (38,12) square-sum
scales — the single-rounding bound DuckDB's hugeint→double cast
needs; scale 20 squares overflowed it and diverged in the last ulp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


@register(
    "q_checksum_table",
    oracle="""
    WITH lines AS (
      SELECT CAST(o_orderkey AS VARCHAR) || '|' ||
             CAST(o_custkey AS VARCHAR) || '|' ||
             o_orderstatus || '|' ||
             CAST(o_totalprice AS VARCHAR) || '|' ||
             strftime(o_orderdate, '%Y-%m-%d') || '|' ||
             o_orderpriority AS line
      FROM orders
    )
    SELECT COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(CONCAT('0x', substring(md5(line), 1, 14))
                              AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR)
             AS checksum
    FROM lines
    """,
)
def q_checksum_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table fingerprint: each row renders to a
    canonical delimited string (explicit date format; doubles via
    their shortest-roundtrip rendering, which both engines produce),
    hashes to md5, keeps 14 hex digits (56 bits — inside int64), and
    SUMs into a DECIMAL(38,0) checksum (emitted as its digit string —
    the exact value crosses engines losslessly where >2^53 numerics
    would not). Addition is commutative, so
    the fingerprint is partition-, order-, and engine-independent —
    the standard migration/replication validation: compare (n_rows,
    checksum) on both sides instead of shipping rows.

    100 TB: one embarrassingly parallel scan with a two-value
    aggregate; per-partition checksums also localize WHERE a
    mismatch lives (group by partition key instead of the global
    sum). Collision odds at 56 bits are negligible for validation."""
    line = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        "o_orderstatus",
        F.col("o_totalprice").cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        "o_orderpriority",
    )
    return (
        load(spark, sf_dir, "orders")
        .select(
            F.conv(F.substring(F.md5(line), 1, 14), 16, 10)
            .cast("bigint")
            .alias("h")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("h").cast("decimal(38,0)"))
            .cast("string")
            .alias("checksum"),
        )
    )


@register(
    "q_session_conversion_rate",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                   OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(SUM(is_start) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_id
      FROM g
    ),
    r AS (
      SELECT user_id, session_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                                ORDER BY ts, event_id) AS rk
      FROM s
    ),
    sess AS (
      SELECT s.user_id, s.session_id,
             MAX(CASE WHEN s.event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted,
             MIN(r.event_type) AS entry_channel
      FROM s JOIN r
        ON r.user_id = s.user_id AND r.session_id = s.session_id
       AND r.rk = 1
      GROUP BY s.user_id, s.session_id
    )
    SELECT entry_channel,
           COUNT(*) AS n_sessions,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           CAST(CAST(SUM(converted) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS conversion_rate
    FROM sess GROUP BY entry_channel
    """,
)
def q_session_conversion_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-grain funnel economics: sessionize (30-min gap, same
    convention as q_sessionize), label each session by its entry
    event type (deterministic argmin over the (ts, event_id) total
    order), flag purchase conversions, and report the conversion rate
    per entry channel — the rollup that turns the raw sessionizer
    into a product metric. The rate is one IEEE division of exact
    counts.

    100 TB: one shuffle on user_id covers the gap-lag, the running
    session id, and the per-session collapse (same key); the channel
    rollup is a tiny second aggregate. Session state never exceeds a
    user's own timeline."""
    from lakehouse_ecommerce_etl_pipeline_spark.operators.windows import (
        sessionize,
    )

    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    s = sessionize(ev, "user_id", "ts", 1800, order_tiebreak=["event_id"])
    sess = s.groupBy("user_id", "session_id").agg(
        F.min_by(
            "event_type", F.struct(F.col("ts"), F.col("event_id"))
        ).alias("entry_channel"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    return sess.groupBy("entry_channel").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        (
            F.sum("converted").cast("bigint").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("conversion_rate"),
    )


@register(
    "q_normalize_embeddings",
    oracle="""
    WITH flat AS (
      SELECT vec_id, u.pos AS pos, u.val AS val
      FROM (
        SELECT vec_id,
               UNNEST(list_transform(CAST(embedding AS DOUBLE[]),
                      (x, i) -> struct_pack(pos := i - 1, val := x))) AS u
        FROM embeddings
      )
    ),
    mom AS (
      SELECT pos,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(val AS DECIMAL(14,6))) AS DECIMAL(38,6))
                  AS DOUBLE) AS s,
             CAST(CAST(SUM(CAST(val AS DECIMAL(14,6))
                           * CAST(val AS DECIMAL(14,6)))
                       AS DECIMAL(38,12)) AS DOUBLE) AS ssq
      FROM flat GROUP BY pos
    )
    SELECT f.vec_id, f.pos,
           (f.val - m.s / m.n)
             / sqrt(m.ssq / m.n - (m.s / m.n) * (m.s / m.n)) AS zval
    FROM flat f JOIN mom m USING (pos)
    """,
)
def q_normalize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score standardization of the embedding table —
    the feature-scaling pass every distance-based model (k-means,
    k-NN, PQ) wants first. Moments per dimension come from
    decimal-exact sums (so the mean/std doubles are identical on both
    engines); the z-score is then IEEE algebra over those identical
    doubles. Output is long-form (vec_id, pos, zval): exact and
    directly consumable; the array rebuild (sorted collect per
    vec_id) is one aggregate away when a vector shape is needed, and
    long-form is what the comparison harness can hash portably.

    100 TB: posexplode → one shuffle keyed on dimension for the
    moments (map-side combined, |dim| groups) → broadcast the tiny
    moment table back over a shuffle-free scan."""
    flat = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "val"
        ),
    )
    vq = F.col("val").cast("decimal(14,6)")
    mom = flat.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(vq).cast("decimal(38,6)").cast("double").alias("s"),
        F.sum(vq * vq).cast("decimal(38,12)").cast("double").alias("ssq"),
    )
    mean = F.col("s") / F.col("n")
    std = F.sqrt(F.col("ssq") / F.col("n") - mean * mean)
    return flat.join(F.broadcast(mom), "pos").select(
        "vec_id",
        "pos",
        ((F.col("val") - mean) / std).alias("zval"),
    )
