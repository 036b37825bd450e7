"""LLM tier XXV: URL canonicalization + URL-level dedup (llm/urls.py).

Ground-truth oracles (same discipline as the PII/HTML tiers): raw
URLs are built deterministically from doc_id with consecutive pairs
(2k, 2k+1) denormalizing the SAME resource differently (case, :80,
``skip/..`` vs ``.`` path detours, swapped query params, fragment);
the oracle states the canonical answer from the construction, so a
canonicalizer that misses one dimension — or collapses too much —
fails by value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakehouse_ecommerce_etl_pipeline_spark.llm.urls import (
    synthetic_urls,
    url_dedup,
    url_normalize,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_CANON = (
    "'http://www.example.com/a/docs/' || CAST(doc_id // 2 AS VARCHAR)"
    " || '?a=1&b=2'"
)


@register(
    "q_url_normalize",
    oracle=f"""
    SELECT doc_id,
           'http' AS scheme,
           'www.example.com' AS host,
           '/a/docs/' || CAST(doc_id // 2 AS VARCHAR) AS path,
           'a=1&b=2' AS query,
           {_CANON} AS norm_url
    FROM documents
    """,
)
def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 3986 canonicalization: scheme/host case-fold, default-port
    strip, dot-segment removal (in-row ``aggregate`` stack fold — no
    explode), query-param ordering, fragment drop. Both
    denormalization styles must land on the identical canonical
    parts.

    100 TB: a narrow projection riding the URL-table scan; the
    sequential dot-segment stack stays inside the row."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    return url_normalize(synthetic_urls(docs, "doc_id"), "doc_id")


@register(
    "q_url_dedup",
    oracle=f"""
    WITH pairs AS (
      SELECT doc_id // 2 AS k, doc_id FROM documents
    )
    SELECT 'http://www.example.com/a/docs/' || CAST(k AS VARCHAR)
             || '?a=1&b=2' AS norm_url,
           CAST(COUNT(*) AS BIGINT) AS n_variants,
           MIN(doc_id) AS keep_id
    FROM pairs GROUP BY k
    """,
)
def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup on the canonical key: the (2k, 2k+1) raw
    variants MUST collapse to one resource row (n_variants = 2, keep
    = the even id; a trailing odd corpus size leaves one singleton) —
    the pre-fetch dedup a crawler runs before any content downloads.

    100 TB: canonicalization is map-side; only (norm_url, id) enters
    the exchange, and the groupBy is partial-aggregable."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    return url_dedup(synthetic_urls(docs, "doc_id"), "doc_id")
