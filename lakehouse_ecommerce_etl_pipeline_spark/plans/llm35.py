"""LLM tier XXXV: frame-level audio features — energy, zero-crossing
rate, peak per 160-sample frame (the VAD/silence-trim/segmentation
primitives an audio-corpus curation gate actually computes).

Clip-level stats exist (q_multimodal_audio_stats); this is the frame
grain those gates decide on: speech/music discrimination thresholds
ZCR, silence trimming thresholds energy, clipping screens threshold
peak — per frame, not per clip. All-integer over int16 PCM and the
synthesis is closed-form in (doc_id, t), so the DuckDB twin replays
every frame's features from the sample formula — including each
frame's INTERNAL sign-flip count via the v(t-1) formula — making a
windowing off-by-one (frame boundary, tail handling, cross-frame
crossing leak) fail by value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakehouse_ecommerce_etl_pipeline_spark.llm.audio import (
    extract_frame_features,
    synthetic_audio,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_FRAME = 160


@register(
    "q_audio_frame_features",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, 400 + (doc_id % 7) * 40 AS n FROM documents
    ),
    samp AS (
      SELECT doc_id, n, UNNEST(generate_series(0, n - 1)) AS t
      FROM base
    ),
    s AS (
      SELECT doc_id, t, CAST(t // {_FRAME} AS INTEGER) AS frame_id,
             (doc_id * 31 + t * t * 7 + t * 13) % 65536 - 32768 AS v,
             CASE WHEN t % {_FRAME} <> 0 THEN
               (doc_id * 31 + (t-1) * (t-1) * 7 + (t-1) * 13) % 65536 - 32768
             END AS v_prev
      FROM samp
      WHERE t < (n // {_FRAME}) * {_FRAME}
    )
    SELECT doc_id AS content_id, frame_id,
           CAST(SUM(v * v) AS BIGINT) AS energy,
           CAST(SUM(CASE WHEN v_prev IS NOT NULL
                          AND ((v_prev < 0) <> (v < 0))
                         THEN 1 ELSE 0 END) AS INTEGER) AS n_zero_cross,
           CAST(MAX(ABS(v)) AS INTEGER) AS peak_abs
    FROM s GROUP BY doc_id, frame_id
    """,
)
def q_audio_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame energy / zero-crossings / peak over REAL decoded WAV
    PCM (manual RIFF chunk walk), 160-sample non-overlapping frames,
    incomplete tail dropped. Full value oracle: the synthesis formula
    lets SQL recompute each sample AND its in-frame predecessor, so
    the zero-crossing window (no cross-frame leakage) is pinned
    exactly.

    100 TB: decode+featurize is one narrow Arrow pass (blobs never
    shuffle); the output is (clip, frame)-keyed integers — the table
    silence-trim and speech-detect gates filter before any expensive
    transcription runs."""
    clips = synthetic_audio(load(spark, sf_dir, "documents"))
    return extract_frame_features(clips, frame_len=_FRAME)
