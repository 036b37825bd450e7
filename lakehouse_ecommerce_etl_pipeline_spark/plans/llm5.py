"""LLM tier V: tokenizer training.

q_bpe_train_merges registers the distributed BPE trainer's merge
table (llm/bpe.py). The merge sequence is an iterative fixpoint-style
loop (count → decide → rewrite), not SQL-expressible — rows-only for
the driver gate; the exact-match verification lives in
tests/test_bpe.py, where the full merge table is compared against an
independent pure-Python reference implementation of the same public
algorithm on the same corpus (a stronger check than a rowcount: every
step, pair, and weighted count must agree)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakehouse_ecommerce_etl_pipeline_spark.llm.bpe import merge_table_df
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_N_MERGES = 8


@register("q_bpe_train_merges")  # rows-only: iterative trainer, no SQL twin
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 8 BPE merges over the documents corpus; returns the merge
    table (step, left, right, merged, pair_count). Deterministic:
    pair counts are integer sums and ties break lexicographically."""
    return merge_table_df(
        spark, load(spark, sf_dir, "documents"), _N_MERGES
    )


@register("q_bpe_encode_corpus")  # rows-only: encoder of an iteratively
# trained model — no SQL twin; exact-match parity with a pure-Python
# reference encoder lives in tests/test_bpe.py
def q_bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 8 BPE merges, then ENCODE the whole corpus with them:
    per-doc token counts after merging, with character conservation
    (n_chars is invariant under merging — the built-in self-check) and
    the multi-char token count that measures how much the trained
    merges actually compress this corpus. Distinct-word factorization
    + literal-inlined merge rules keep the encode one codegen'd
    projection over the vocabulary (llm/bpe.py encode_corpus)."""
    from lakehouse_ecommerce_etl_pipeline_spark.llm.bpe import (
        encode_corpus,
        train_bpe,
    )

    docs = load(spark, sf_dir, "documents")
    return encode_corpus(spark, docs, train_bpe(spark, docs, _N_MERGES))
