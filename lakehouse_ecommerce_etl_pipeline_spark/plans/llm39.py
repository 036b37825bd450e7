"""LLM tier XL: pairwise n-gram overlap scoring (ROUGE-2).

The eval-side metric family: SFT/DPO pipelines score a candidate
against a reference by clipped n-gram overlap (ROUGE), and dataset
builders use the same statistic to audit paired rows (is the
"rejected" response a trivial near-copy of the "chosen" one?).  The
corpus already ships corpus-level n-gram machinery (q_contamination_
ngrams: train-vs-test; q_bigram_novelty: doc-vs-corpus); this tier
adds the PAIRWISE form — per (reference, candidate) pair — which is
what an eval harness emits per example.

ROUGE-2 F1 decomposes into exact integers: per-document bigram
multiset counts (one map-side-combined groupBy over the corpus), a
pair-scoped equi-join on (pair key, bigram) taking LEAST of the two
counts (the clipping), and F1 = 2·overlap / (|A| + |B|) — ONE double
division of exact integers, bit-stable cross-engine
([[oracle-exactness-rules]] discipline).

Pairing is deterministic and SQL-mirrorable: document d (even id)
pairs with d+1 when it exists — the positional-pair convention
q_dpo_pairs uses, without the quality ranking (the metric, not the
selection, is under test).  Tokenization matches the corpus's
canonical form (_NORM: lower, collapse whitespace, trim; bigrams
over the UNFILTERED split, llm29's convention).

100 TB: bigram counts are corpus-sized with partial aggregation;
the overlap join ships each bigram row once, keyed by (pair, bigram)
— co-partitioned equi-join, no pair explosion beyond true matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.functions.text import (
    normalize_text,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.llm import _NORM
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


def _bigram_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, big, c): bigram multiset counts over the canonical
    token split (unfiltered, position-adjacent)."""
    toks = docs.select(
        "doc_id", F.split(normalize_text("text"), " ").alias("toks")
    )
    bigs = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> concat(toks[i], '|', toks[i + 1]))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("big"),
    )
    return bigs.groupBy("doc_id", "big").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )


@register(
    "q_rouge2_pairs",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents
    ),
    p AS (
      SELECT doc_id, unnest(toks) AS tok,
             unnest(range(1, length(toks) + 1)) AS pos
      FROM d
    ),
    bg AS (
      SELECT a.doc_id, a.tok || '|' || b.tok AS big
      FROM p a JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ),
    c AS (
      SELECT doc_id, big, CAST(COUNT(*) AS BIGINT) AS c
      FROM bg GROUP BY doc_id, big
    ),
    tot AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS t FROM c GROUP BY doc_id
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      WHERE a.doc_id % 2 = 0
    ),
    ov AS (
      SELECT p.doc_a, CAST(SUM(LEAST(ca.c, cb.c)) AS BIGINT) AS ov
      FROM pairs p
      JOIN c ca ON ca.doc_id = p.doc_a
      JOIN c cb ON cb.doc_id = p.doc_b AND cb.big = ca.big
      GROUP BY p.doc_a
    )
    SELECT p.doc_a, p.doc_b,
           COALESCE(o.ov, 0) AS overlap_bigrams,
           COALESCE(ta.t, 0) AS bigrams_a,
           COALESCE(tb.t, 0) AS bigrams_b,
           CASE WHEN COALESCE(ta.t, 0) + COALESCE(tb.t, 0) = 0 THEN NULL
                ELSE CAST(2 * COALESCE(o.ov, 0) AS DOUBLE)
                     / CAST(COALESCE(ta.t, 0) + COALESCE(tb.t, 0) AS DOUBLE)
           END AS rouge2_f1
    FROM pairs p
    LEFT JOIN ov o ON o.doc_a = p.doc_a
    LEFT JOIN tot ta ON ta.doc_id = p.doc_a
    LEFT JOIN tot tb ON tb.doc_id = p.doc_b
    """,
)
def q_rouge2_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2 per document pair (even id ↔ id+1): clipped bigram
    overlap, both bigram totals, and F1 = 2·overlap/(|A|+|B|).  The
    overlap join is keyed (pair, bigram) so only true matches ship;
    the CASE guard covers sub-2-token texts on both engines (NULL F1,
    never a division)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    ids = docs.select("doc_id")
    pairs = (
        ids.filter(F.col("doc_id") % 2 == 0)
        .select(F.col("doc_id").alias("doc_a"))
        .join(
            ids.select((F.col("doc_id") - 1).alias("doc_a")),
            "doc_a",
            "left_semi",
        )
        .select("doc_a", (F.col("doc_a") + 1).alias("doc_b"))
    )
    c = _bigram_counts(docs)
    tot = c.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("t"))
    ca = c.select(F.col("doc_id").alias("doc_a"), "big", F.col("c").alias("ca"))
    cb = c.select(
        (F.col("doc_id") - 1).alias("doc_a"), "big", F.col("c").alias("cb")
    )
    ov = (
        pairs.join(ca, "doc_a")
        .join(cb, ["doc_a", "big"])
        .groupBy("doc_a")
        .agg(F.sum(F.least("ca", "cb")).cast("bigint").alias("ov"))
    )
    ta = tot.select(F.col("doc_id").alias("doc_a"), F.col("t").alias("ta"))
    tb = tot.select(
        (F.col("doc_id") - 1).alias("doc_a"), F.col("t").alias("tb")
    )
    out = (
        pairs.join(ov, "doc_a", "left")
        .join(ta, "doc_a", "left")
        .join(tb, "doc_a", "left")
        .select(
            "doc_a",
            "doc_b",
            F.coalesce("ov", F.lit(0)).alias("overlap_bigrams"),
            F.coalesce("ta", F.lit(0)).alias("bigrams_a"),
            F.coalesce("tb", F.lit(0)).alias("bigrams_b"),
        )
    )
    denom = F.col("bigrams_a") + F.col("bigrams_b")
    return out.withColumn(
        "rouge2_f1",
        F.when(denom == 0, F.lit(None).cast("double")).otherwise(
            (2 * F.col("overlap_bigrams")).cast("double")
            / denom.cast("double")
        ),
    )
