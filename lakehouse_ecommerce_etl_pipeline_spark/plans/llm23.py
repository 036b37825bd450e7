"""LLM tier XXIII: HTML → text extraction + boilerplate removal
(llm/html.py) — the stage every web-crawl corpus runs first.

Oracle strategy (same discipline as the PII tier, plans/llm22.py):
pages are built deterministically around the documents table's text
(closed form in doc_id ⇒ SQL-reproducible), the REAL
strip/unescape/paragraph kernels run downstream, and the oracle
states GROUND TRUTH — what a correct extraction must return, byte
for byte — rather than replaying the kernel's regexes in SQL. An
extractor that leaves a tag, eats a character, double-unescapes an
entity, or keeps a link-farm paragraph fails by value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakehouse_ecommerce_etl_pipeline_spark.llm.html import (
    boilerplate_stats,
    extract_text,
    main_content,
    synthetic_pages,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

# the text as the extractor must see it: whitespace-collapsed, no case folding
_CLEAN = "trim(regexp_replace(text, '\\s+', ' ', 'g'))"

# ground truth for full-page extraction (synthetic_pages layout):
# title, nav anchors, h1, content paragraph, link-farm paragraph,
# entity div (unescaped exactly one level), footer (+feed link text
# when doc_id % 3 = 0)
_EXPECT_TEXT = f"""trim(regexp_replace(
      'Doc ' || CAST(doc_id AS VARCHAR)
      || ' Home About Doc ' || CAST(doc_id AS VARCHAR)
      || ' ' || {_CLEAN}
      || ' more links Tom & Jerry <3 "quotes" ''apos'' A B '
      || CASE WHEN doc_id % 3 = 0 THEN 'feed ' ELSE '' END
      || 'id ' || CAST(doc_id % 100 AS VARCHAR),
      '\\s+', ' ', 'g'))"""


@register(
    "q_html_extract_text",
    oracle=f"""
    WITH expect AS (
      SELECT doc_id, {_EXPECT_TEXT} AS t FROM documents
    )
    SELECT doc_id,
           CAST(length(t) AS INTEGER) AS n_chars,
           md5(t) AS text_fp
    FROM expect
    """,
)
def q_html_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-page HTML → text: script/style blocks dropped wholesale,
    tags stripped, the common entity set unescaped (&amp; last — one
    level only), whitespace collapsed. Byte-pinned against the
    ground-truth reconstruction via md5.

    100 TB: a regexp_replace chain riding the page scan — per-row
    codegen, zero shuffles, linear in bytes."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return extract_text(synthetic_pages(docs, "doc_id", "text"), "doc_id")


@register(
    "q_html_boilerplate_stats",
    oracle=f"""
    WITH expect AS (
      SELECT doc_id, {_EXPECT_TEXT} AS t FROM documents
    )
    SELECT doc_id,
           CAST(4 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INTEGER)
             AS n_links,
           CAST(1 AS INTEGER) AS n_scripts,
           CAST(2 AS INTEGER) AS n_paragraphs,
           CAST(length(t) AS INTEGER) AS text_len,
           ROUND(CAST(4 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                      AS DOUBLE)
                 / CAST(GREATEST(length(t), 1) AS DOUBLE), 6)
             AS link_density
    FROM expect
    """,
)
def q_html_boilerplate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-level boilerplate signals (anchor/script/paragraph counts,
    link density over extracted text) — the thresholds a corpus page
    filter runs on. Counts are checked against the known page
    construction, density against the ground-truth text length."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return boilerplate_stats(synthetic_pages(docs, "doc_id", "text"), "doc_id")


@register(
    "q_html_main_content",
    oracle=f"""
    WITH expect AS (
      SELECT doc_id, {_CLEAN} AS t FROM documents
    )
    SELECT doc_id,
           CAST(2 AS INTEGER) AS n_paragraphs,
           CAST(1 AS INTEGER) AS n_kept,
           CAST(length(t) AS INTEGER) AS main_len,
           md5(t) AS main_fp
    FROM expect
    """,
)
def q_html_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level boilerplate removal (jusText-lite): <p> blocks
    extracted per page, link-bearing paragraphs dropped, survivors'
    stripped text joined. Ground truth: exactly the document's own
    text survives (the link-farm paragraph dies), pinned via md5.

    100 TB: the per-paragraph loop runs INSIDE the row (higher-order
    filter/transform over regexp_extract_all) — no explode, no
    shuffle; pages never leave their partition."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return main_content(synthetic_pages(docs, "doc_id", "text"), "doc_id")
