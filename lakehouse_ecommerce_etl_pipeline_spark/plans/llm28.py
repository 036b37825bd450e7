"""LLM tier XXVIII: SPAN-level duplication profiling — the signal
behind substring dedup (Lee et al.'s "Deduplicating Training Data
Makes Language Models Better" removes repeated SPANS with suffix
arrays; the distributed proxy is fixed-width shingle multiplicity).

Document-level dedup (exact / MinHash tiers) misses the common
failure where distinct documents share large verbatim spans
(boilerplate, quotes, templates). The span profile answers "how much
of the corpus is repeated text?": every 8-token shingle is hashed
IN-ROW (transform over the positional token array — one md5 per
shingle, no token explosion until the count), then the corpus-wide
multiplicity histogram says how duplicated the span space is.

100 TB: the only exchange carries 16-byte shingle hashes (doc ids
dropped before the global count via per-doc distinct in-row); the
two-level aggregation is partial-aggregable end-to-end. This is the
cheap always-on diagnostic; a positive signal justifies running the
expensive span-REMOVAL pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.functions.text import normalize_text
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_K = 8  # shingle width (tokens)

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def shingle_hashes(text_col: str, k: int = _K):
    """Positional (order-preserving, duplicate-preserving) token
    array → array of md5(k-gram) — computed entirely in-row."""
    toks = F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
    return F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))


@register(
    "q_dup_span_histogram",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split({_NORM}, ' '), t -> t <> '') AS tk
      FROM documents
    ),
    shingles AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, len(tk) - {_K - 1}),
               i -> md5(array_to_string(tk[i:i + {_K - 1}], ' '))
             )) AS sh
      FROM toks WHERE len(tk) >= {_K}
    ),
    per_shingle AS (
      SELECT sh, COUNT(DISTINCT doc_id) AS n_docs
      FROM shingles GROUP BY sh
    )
    SELECT n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_shingles
    FROM per_shingle GROUP BY n_docs
    """,
)
def q_dup_span_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus span-duplication histogram: for every distinct 8-token
    shingle, in how many documents does it appear — rolled up to
    (multiplicity → shingle count). n_docs = 1 is unique text;
    the tail mass at high n_docs is verbatim boilerplate that
    document-level dedup cannot see.

    100 TB: per-doc distinctness happens IN-ROW (array_distinct on
    the shingle array before the explode), so no (doc_id, hash)
    exchange ever exists — the explode feeds the per-shingle count
    directly and only 16-byte hashes cross the two remaining
    partial-aggregable exchanges."""
    docs = load(spark, sf_dir, "documents")
    sh = docs.select(
        F.explode(F.array_distinct(shingle_hashes("text"))).alias("sh")
    )
    per = sh.groupBy("sh").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return per.groupBy("n_docs").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles")
    )
