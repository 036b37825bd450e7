"""LLM tier XV: audio decode (the third modality) and the
negative-condition funnel.

q_multimodal_audio_stats completes the multimodal column family —
images are decoded (PPM/BMP/PNG kernels), video is frame-sampled, and
now audio is container-parsed PCM with exact sample statistics, all
through the same opaque-binary + Arrow mapInPandas plumbing, all
VALUE-oracled via closed-form synthesis.

q_funnel_no_interference adds the funnel shape product analytics
always needs next: A→B conversion that DISQUALIFIES on an
intervening C — a pure window composition (last-A / last-C running
endpoints), no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.llm.audio import (
    extract_audio_stats,
    synthetic_audio,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


@register(
    "q_multimodal_audio_stats",
    oracle="""
    WITH base AS (
      SELECT doc_id, 400 + (doc_id % 7) * 40 AS n,
             CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS rate
      FROM documents
    ),
    samp AS (
      SELECT doc_id, n, rate,
             UNNEST(generate_series(0, n - 1)) AS t
      FROM base
    ),
    s AS (
      SELECT doc_id, n, rate,
             (doc_id * 31 + t * t * 7 + t * 13) % 65536 - 32768 AS v
      FROM samp
    )
    SELECT doc_id AS content_id,
           MAX(rate) AS sample_rate,
           CAST(1 AS INTEGER) AS n_channels,
           CAST(MAX(n) AS BIGINT) AS n_samples,
           CAST(SUM(v) AS BIGINT) AS sum_samples,
           CAST(SUM(v * v) AS BIGINT) AS sum_squares,
           CAST(MAX(v) AS INTEGER) AS peak_max,
           CAST(MIN(v) AS INTEGER) AS peak_min
    FROM s GROUP BY doc_id
    """,
)
def q_multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode over binary columns: genuine RIFF/WAVE PCM
    payloads are synthesized per document id (stdlib ``wave`` writer),
    then decoded by a MANUAL container parse (chunk walk, fmt block,
    int16 PCM extraction — llm/audio.py) in the Arrow mapInPandas
    path, yielding exact integer sample statistics.  The closed-form
    id→samples construction makes every statistic SQL-derivable, so
    this is a full VALUE oracle over a genuine decode kernel — the
    audio sibling of q_multimodal_meta's image decoders.

    100 TB: blobs never leave binary columns; decode is narrow
    per-batch work with no shuffle, and the integer sums are
    order-free so any partitioning gives identical hashes.  Real
    codecs (mp3/flac) slot behind the same format sniff; the peak /
    RMS-numerator stats computed here are exactly the silence/clip
    screens an audio-corpus quality gate runs."""
    clips = synthetic_audio(load(spark, sf_dir, "documents"))
    return extract_audio_stats(clips)


@register(
    "q_funnel_no_interference",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, ts, event_type,
             LAST_VALUE(CASE WHEN event_type = 'view' THEN ts END
                        IGNORE NULLS) OVER w AS last_view,
             LAST_VALUE(CASE WHEN event_type = 'error' THEN ts END
                        IGNORE NULLS) OVER w AS last_error
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CASE WHEN last_view IS NOT NULL
                          AND last_view >= ts - INTERVAL 2 HOUR
                          AND (last_error IS NULL
                               OR last_error < last_view)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
    FROM e
    WHERE event_type = 'purchase'
    GROUP BY user_id
    """,
)
def q_funnel_no_interference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-condition funnel: purchases that convert from a view
    within 2 h with NO error event in between — the 'clean
    conversion' metric (an intervening error disqualifies the pair,
    which plain A→B funnels overcount).  One running window per user
    carries the last-view and last-error timestamps; the
    qualification test is then a row-local predicate — no self-join,
    no explode.

    100 TB: a single sort-based window partitioned by user (the same
    shuffle every sessionization query pays), then a per-user
    aggregate.  Adding more negative or positive conditions is one
    more running endpoint each — O(1) state per condition, which is
    why the window form beats the k-way self-join as funnels grow."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.last(
            F.when(F.col("event_type") == "view", F.col("ts")),
            ignorenulls=True,
        )
        .over(w)
        .alias("last_view"),
        F.last(
            F.when(F.col("event_type") == "error", F.col("ts")),
            ignorenulls=True,
        )
        .over(w)
        .alias("last_error"),
    )
    clean = (
        F.col("last_view").isNotNull()
        & (F.col("last_view") >= F.col("ts") - F.expr("INTERVAL 2 HOUR"))
        & (
            F.col("last_error").isNull()
            | (F.col("last_error") < F.col("last_view"))
        )
    )
    return (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum(clean.cast("int")).cast("bigint").alias("n_clean"),
        )
    )
