"""LLM tier XXVII: the WEB-corpus pipeline end-to-end — one
value-oracled query composing this round's curation stages the way a
crawl-to-corpus run actually chains them:

    raw URLs → canonical-key URL dedup (pre-fetch)
             → fetch (the kept variant's page)
             → HTML main-content extraction (boilerplate dies)
             → frozen quality-classifier gate (linear margin)
             → per-verdict dataset card

Same discipline as q_corpus_pipeline_e2e (near-dup chain) and
q_multimodal_pipeline_e2e (image chain): the per-stage operators are
each independently oracled in their own tiers (llm23/llm25/llm26);
THIS query pins their COMPOSITION — the oracle replays the whole
chain from the closed-form constructions, so a stage that changes
its contract breaks this query even if its own tier still passes.

Near-dup dedup deliberately does not re-appear here — its
composition is already value-pinned end-to-end by
q_corpus_pipeline_e2e; chaining it again would re-test the same
edges at double the oracle cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.functions import text as txt
from lakehouse_ecommerce_etl_pipeline_spark.llm.html import (
    main_text_col,
    synthetic_pages,
)
from lakehouse_ecommerce_etl_pipeline_spark.llm.logreg import margin
from lakehouse_ecommerce_etl_pipeline_spark.llm.urls import (
    synthetic_urls,
    url_dedup,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.llm import _PUNCT_RE
from lakehouse_ecommerce_etl_pipeline_spark.plans.llm26 import _COLS, _W
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

# the extracted main text, closed form: the document's own text,
# whitespace-collapsed (the link-farm paragraph and all boilerplate die)
_MT = "trim(regexp_replace(text, '\\s+', ' ', 'g'))"
_MT_NTOK = (
    f"CASE WHEN length({_MT}) = 0 THEN 0 "
    f"ELSE length({_MT}) - length(replace({_MT}, ' ', '')) + 1 END"
)
_MT_PUNCT = (
    f"CASE WHEN length({_MT}) = 0 THEN 0.0 "
    f"ELSE CAST(length({_MT}) - length(regexp_replace({_MT}, '{_PUNCT_RE}', '', 'g')) AS DOUBLE)"
    f" / CAST(length({_MT}) AS DOUBLE) END"
)
_MT_Z = (
    f"{_W[0]} + (length({_MT}) / 1000.0) * {_W[1]}"
    f" + ({_MT_PUNCT}) * {_W[2]}"
    f" + (CAST({_MT_NTOK} AS DOUBLE) / 100.0) * {_W[3]}"
)


@register(
    "q_web_corpus_pipeline_e2e",
    oracle=f"""
    WITH fetched AS (
      -- URL dedup keeps the smallest-id variant of each resource:
      -- the even id of every (2k, 2k+1) pair
      SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
    ),
    gated AS (
      SELECT doc_id, {_MT} AS t, ({_MT_Z}) > 0 AS keep, {_MT_Z} AS z
      FROM fetched
    )
    SELECT keep,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(t)) AS BIGINT) AS total_chars,
           MIN(z) AS min_z,
           MAX(z) AS max_z
    FROM gated GROUP BY keep
    """,
)
def q_web_corpus_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-to-corpus chain as ONE query, every stage the real
    operator: (1) canonical-key URL dedup over the raw variant URLs —
    only kept ids fetch; (2) the fetched pages' HTML runs through the
    jusText-lite extractor — exactly the document text survives; (3)
    the frozen logreg gate scores the EXTRACTED text (margin in exact
    arithmetic); (4) the dataset card rolls up per verdict with
    order-independent stats only (integer sums, double min/max — no
    float accumulation order in the oracle surface).

    100 TB: stage order IS the cost model — URL dedup runs before any
    fetch (cheapest key kills the most bytes), extraction and the gate
    ride the page scan, and only the card's two rows leave."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    kept_ids = url_dedup(synthetic_urls(docs, "doc_id"), "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    fetched = docs.join(F.broadcast(kept_ids), "doc_id")
    pages = synthetic_pages(fetched, "doc_id", "text")
    extracted = pages.select(
        "doc_id", main_text_col(F.col("html")).alias("main_text")
    )
    feats = extracted.select(
        "doc_id",
        F.col("main_text"),
        (txt.n_chars("main_text") / F.lit(1000.0)).alias("x_len"),
        txt.punct_ratio("main_text").alias("x_punct"),
        (txt.n_tokens("main_text") / F.lit(100.0)).alias("x_tok"),
    )
    z = margin(_COLS, _W)
    gated = feats.select(
        "doc_id", "main_text", z.alias("z"), (z > 0).alias("keep")
    )
    return gated.groupBy("keep").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.length("main_text")).cast("bigint").alias("total_chars"),
        F.min("z").alias("min_z"),
        F.max("z").alias("max_z"),
    )
