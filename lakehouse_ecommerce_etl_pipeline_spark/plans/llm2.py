"""LLM-pipeline tier II: the selection/packing/vocabulary layer —
deterministic train/val splits, token-budget sequence packing,
vocabulary construction, and per-document salient-term extraction.
All four are exact cross-engine (hash thresholds, integer window
arithmetic, rank tiebreaks — no RNG, no floats in any comparison).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

# SQL fragments mirroring functions/text.py exactly (see plans/llm.py)
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_T = "regexp_replace(trim(text), '\\s+', ' ', 'g')"
_NTOK = (
    f"CASE WHEN length({_T}) = 0 THEN 0 "
    f"ELSE length({_T}) - length(replace({_T}, ' ', '')) + 1 END"
)


@register(
    "q_split_train_val",
    oracle="""
    SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS min_id
    FROM (
      SELECT doc_id,
             CASE WHEN md5('split:' || CAST(doc_id AS VARCHAR)) < '1'
                  THEN 'val' ELSE 'train' END AS split
      FROM documents
    ) GROUP BY split ORDER BY split
    """,
)
def q_split_train_val(spark, sf_dir):
    """Reproducible train/validation split: membership = md5 of the
    salted id compared lexicographically against a hex threshold
    ('1' → 1/16 of the keyspace). Unlike ``DataFrame.sample`` the
    assignment survives repartitioning, task retries, and engine
    swaps — the property a training pipeline needs so examples never
    leak across the split on re-runs. Stateless projection: no
    shuffle, scales linearly."""
    from lakehouse_ecommerce_etl_pipeline_spark.llm.sampling import (
        deterministic_split,
    )

    docs = load(spark, sf_dir, "documents")
    return (
        deterministic_split(docs, "doc_id", threshold_hex="1")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_id"),
        )
        .orderBy("split")
    )


@register(
    "q_stratified_sample",
    oracle="""
    SELECT source, COUNT(*) AS n_kept, MIN(doc_id) AS min_id
    FROM documents
    WHERE md5('strat:' || CAST(doc_id AS VARCHAR)) <
          CASE WHEN source = 'src0' THEN 'g'
               WHEN source = 'src1' THEN '8'
               WHEN source = 'src2' THEN '2'
               ELSE '4' END
    GROUP BY source ORDER BY source
    """,
)
def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling (reproducible ``sampleBy``):
    per-source keep rates via md5 hex thresholds — keep all of src0
    ('g' sorts above every hex digest), ~1/2 of src1, ~1/8 of src2,
    ~1/4 elsewhere. The source-mix rebalancing step of corpus
    construction; membership is stable under repartition/retry."""
    from lakehouse_ecommerce_etl_pipeline_spark.llm.sampling import (
        stratified_sample,
    )

    docs = load(spark, sf_dir, "documents")
    kept = stratified_sample(
        docs,
        "doc_id",
        "source",
        {"src0": "g", "src1": "8", "src2": "2"},
        default_threshold="4",
    )
    return (
        kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.min("doc_id").alias("min_id"))
        .orderBy("source")
    )


@register(
    "q_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT source AS shard, doc_id, CAST({_NTOK} AS BIGINT) AS tok_count
      FROM documents
    ), placed AS (
      SELECT shard, doc_id, tok_count,
             CAST(SUM(tok_count) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - tok_count AS BIGINT) AS "offset"
      FROM toks
    )
    SELECT shard, doc_id, tok_count, "offset",
           CAST(FLOOR("offset" / 512.0) AS BIGINT) AS bin
    FROM placed
    """,
)
def q_pack_sequences(spark, sf_dir):
    """Token-budget sequence packing (streaming concatenate-and-cut):
    per shard, documents in id order are assigned offsets in the
    concatenated token stream and cut into 512-token bins — the
    batch-layout step before tokenization in a pretraining pipeline.

    Scale: the running-sum window partitions by shard, so no global
    sort and no single-task funnel; each shard's layout is an
    independent task. Integer window arithmetic end-to-end."""
    from lakehouse_ecommerce_etl_pipeline_spark.llm.sampling import pack_sequences

    docs = load(spark, sf_dir, "documents")
    return pack_sequences(docs, budget=512)


@register(
    "q_vocab_topn",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split({_NORM}, ' ')) AS tok FROM documents
    ), counts AS (
      SELECT tok, COUNT(*) AS n FROM tok WHERE tok <> '' GROUP BY tok
    )
    SELECT tok, n, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS BIGINT)
             AS vocab_id
    FROM counts
    ORDER BY vocab_id
    LIMIT 100
    """,
)
def q_vocab_topn(spark, sf_dir):
    """Frequency-ranked vocabulary construction: corpus-wide term
    frequencies → top-100 tokens with dense ids (the id assignment a
    tokenizer-training step consumes). Total order via (count DESC,
    token) so ids are deterministic.

    Scale: token counting is a map-side-combinable aggregate; only
    the (distinct-token, count) table — orders of magnitude smaller
    than the corpus — reaches the final rank, and WindowGroupLimit /
    TakeOrderedAndProject keeps the top-k bounded per partition."""
    from lakehouse_ecommerce_etl_pipeline_spark.llm.dedup import tokens

    docs = load(spark, sf_dir, "documents")
    counts = (
        tokens(docs, "doc_id", "text", distinct=False)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("tok"))
    return (
        counts.withColumn("vocab_id", F.row_number().over(w).cast("long"))
        .filter(F.col("vocab_id") <= 100)
        .orderBy("vocab_id")
    )


@register(
    "q_term_salience",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok FROM documents
    ), tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf
      FROM tok WHERE tok <> '' GROUP BY doc_id, tok
    ), df AS (
      SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
    ), ranked AS (
      SELECT tf.doc_id, tf.tok, tf.tf, df.df,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf DESC, df.df ASC, tf.tok) AS rn
      FROM tf JOIN df ON tf.tok = df.tok
    )
    SELECT doc_id, tok, tf, df, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 3
    """,
)
def q_term_salience(spark, sf_dir):
    """Per-document salient terms, tf-idf style: rank a document's
    terms by (term frequency DESC, document frequency ASC) — idf is
    monotone-decreasing in df, so the df tiebreak prefers exactly the
    rarer (higher-idf) term; keeping the comparison on the two exact
    integers instead of tf·log(N/df) makes the top-3 reproducible
    bit-for-bit across engines (no libm, no epsilon).

    Scale: tf shuffles on (doc, token) — combinable; df aggregates
    tf's output (already token-keyed); the per-doc top-3 window is
    WindowGroupLimit-pruned before the final shuffle."""
    from lakehouse_ecommerce_etl_pipeline_spark.llm.dedup import tokens

    docs = load(spark, sf_dir, "documents")
    tf = (
        tokens(docs, "doc_id", "text", distinct=False)
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("tok")
    )
    return (
        tf.join(df, "tok")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tok", "tf", "df", "rn")
    )
