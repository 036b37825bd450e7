"""LLM tier IX: multimodal temporal pooling.

q_multimodal_temporal_pool completes the video-pipeline plumbing the
frame tier started (q_multimodal_framehash): sampled frames →
per-frame feature vectors → ONE pooled clip-level representation per
document (mean + max over the temporal axis). The decode/embed kernel
is a deterministic md5-derived stand-in so the whole pass stays
SQL-expressible and value-oracled; a real image/video encoder slots
into the same shape via the mapInPandas path (llm/multimodal.py),
with the pooling stage unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_FRAME = 64
_DIMS = 4


def _feat_sql(d: int) -> str:
    """DuckDB: 16-bit integer feature d from the frame digest."""
    return (
        f"CAST(CONCAT('0x', substring(md5(frame), {d * 4 + 1}, 4)) "
        f"AS BIGINT)"
    )


@register(
    "q_multimodal_temporal_pool",
    oracle=f"""
    WITH fr AS (
      SELECT doc_id,
             substr(text,
                    CAST(i * {_FRAME} + 1 AS BIGINT), {_FRAME}) AS frame
      FROM (
        SELECT doc_id, text,
               unnest(range(0, greatest((length(text) + {_FRAME - 1})
                                        // {_FRAME}, 1))) AS i
        FROM documents
      )
    ),
    feat AS (
      SELECT doc_id,
             {", ".join(f"{_feat_sql(d)} AS f{d}" for d in range(_DIMS))}
      FROM fr
    )
    SELECT doc_id,
           COUNT(*) AS n_frames,
           {", ".join(
               f"CAST(CAST(SUM(f{d}) AS BIGINT) AS DOUBLE) "
               f"/ CAST(COUNT(*) AS DOUBLE) AS mean_f{d}, "
               f"MAX(f{d}) AS max_f{d}"
               for d in range(_DIMS)
           )}
    FROM feat GROUP BY doc_id
    """,
)
def q_multimodal_temporal_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal pooling over per-frame features: every {_FRAME}-byte
    frame yields a {_DIMS}-dim integer feature vector (md5-derived —
    the deterministic stand-in for a frame encoder), pooled per
    document with mean and max over the temporal axis — the standard
    clip-level representation (mean for content, max for salient
    peaks). Features are 16-bit ints, sums stay far inside int64, and
    each mean is one IEEE division of identical integers.

    100 TB: frames never shuffle — featurization happens in the scan
    task and only the {_DIMS}-wide feature rows move into a map-side-
    combined aggregate keyed on doc_id (the explode-then-combine
    collapses to one row per doc per partition). Swapping the hash
    for a real encoder moves the featurize step into Arrow-batched
    mapInPandas; the pooling aggregate is untouched."""
    frames = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            f"explode(sequence(0, greatest((length(text) + {_FRAME - 1}) "
            f"div {_FRAME}, 1) - 1))"
        ).alias("i"),
        "text",
    ).select(
        "doc_id",
        F.expr(f"substring(text, i * {_FRAME} + 1, {_FRAME})").alias("frame"),
    )
    feat = frames.select(
        "doc_id",
        *[
            F.conv(F.substring(F.md5("frame"), d * 4 + 1, 4), 16, 10)
            .cast("bigint")
            .alias(f"f{d}")
            for d in range(_DIMS)
        ],
    )
    aggs = [F.count(F.lit(1)).alias("n_frames")]
    for d in range(_DIMS):
        aggs.append(
            (
                F.sum(f"f{d}").cast("bigint").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias(f"mean_f{d}")
        )
        aggs.append(F.max(f"f{d}").alias(f"max_f{d}"))
    return feat.groupBy("doc_id").agg(*aggs)
