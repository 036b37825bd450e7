"""LLM tier XXXIV: GIF decode — dictionary coding (LZW) + indexed
color joins the multimodal codec family (llm/gif.py).

The oracle extends the q_multimodal_meta protocol to NON-constant
indexed-color content: pixel index and palette are closed-form in
(doc_id, x, y), so DuckDB replays the exact per-channel sums over a
generate-range lattice — a wrong palette lookup, bit-order slip in
the LZW reader, dictionary-growth off-by-one, or sub-block framing
bug all change some image's sums and fail by value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakehouse_ecommerce_etl_pipeline_spark.llm.gif import synthetic_gifs
from lakehouse_ecommerce_etl_pipeline_spark.llm.multimodal import (
    extract_image_stats,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


@register(
    "q_multimodal_gif",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 5 AS h
      FROM documents
    ),
    xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM dims),
    px AS (
      SELECT doc_id, w, h, (doc_id + x + 3 * unnest(range(0, h))) % 8 AS i
      FROM xs
    )
    SELECT doc_id AS content_id,
           CAST(MAX(w) AS INTEGER) AS width,
           CAST(MAX(h) AS INTEGER) AS height,
           'gif' AS format,
           CAST(SUM((doc_id + 31 * i) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((7 * doc_id + 57 * i) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((13 * doc_id + 89 * i) % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id
    """,
)
def q_multimodal_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF87a decode over binary columns: deterministic
    palette+LZW payloads generated per doc id, decoded through the
    full container walk (screen descriptor → color table → sub-block
    defragment → variable-width LZW with dictionary growth → palette
    mapping) to dimensions + exact per-channel pixel sums — the same
    mapInPandas shape as the PPM/BMP/PNG/JPEG legs.

    100 TB: decode is embarrassingly parallel and shuffle-free — the
    binary column never leaves its scan task; only the 7-column stats
    row continues downstream. The codec is pure Python per image
    (~100 px here); for real corpora the identical plumbing hosts a
    native decoder — the plan shape is what this query pins."""
    imgs = synthetic_gifs(load(spark, sf_dir, "documents"))
    return extract_image_stats(imgs)
