"""Training-data sampling & packing operators — the selection layer a
100 TB pretraining pipeline runs between dedup and tokenization.

All of them avoid engine-local RNG: randomness comes from md5 of the
row key, so every engine, every run, and every retry of a failed task
produces the SAME split — reproducibility the built-in ``sample()``
(seeded per-partition RNG, repartition-sensitive) cannot give.

100 TB notes: hash-split is a stateless per-row projection (no
shuffle, fully pushdown-friendly); packing partitions by shard
(`source`) so the running-sum window never funnels the corpus through
one task — bin ids are (source, bin) pairs, exactly how a real
sharded packer emits them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.functions.text import n_tokens


def hash_bucket(key: Column, salt: str) -> Column:
    """md5(salt || key) hex — uniform in [0,16^32), compared
    lexicographically against a hex threshold. Lowercase-hex string
    order is identical across engines, so a split threshold needs no
    integer conversion (DuckDB lacks conv-from-hex)."""
    return F.md5(F.concat(F.lit(salt), key.cast("string")))


def deterministic_split(
    df: DataFrame,
    id_col: str,
    threshold_hex: str = "1",
    salt: str = "split:",
    val_label: str = "val",
    train_label: str = "train",
) -> DataFrame:
    """Reproducible train/validation assignment: a row is validation
    iff md5(salt||id) < threshold_hex. Thresholds are dyadic-hex
    fractions ('1' → 1/16 ≈ 6.25 %, '28' → 0x28/256 ≈ 15.6 %) — the
    fraction is approximate, the MEMBERSHIP is exact and stable under
    any repartitioning, retry, or engine change."""
    return df.withColumn(
        "split",
        F.when(
            hash_bucket(F.col(id_col), salt) < threshold_hex, F.lit(val_label)
        ).otherwise(F.lit(train_label)),
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    thresholds: dict[str, str],
    default_threshold: str = "0",
    salt: str = "strat:",
) -> DataFrame:
    """Deterministic per-stratum sampling (the reproducible analogue
    of ``DataFrame.sampleBy``): a row survives iff md5(salt||id) <
    its stratum's hex threshold. Used to rebalance source mixes in a
    training corpus (down-weight a crawl, keep all of a curated set:
    threshold 'g' > 'ffffffff…' keeps everything, '0' drops all).

    Same scale shape as the split: stateless projection, the
    threshold map ships as a CASE expression (no join)."""
    bucket = hash_bucket(F.col(id_col), salt)
    expr: Column = F.lit(default_threshold)
    for stratum, th in sorted(thresholds.items()):
        expr = F.when(F.col(stratum_col) == stratum, F.lit(th)).otherwise(expr)
    return df.filter(bucket < expr)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget sequence packing: within each shard, documents are
    laid out in id order and assigned to consecutive bins of ~`budget`
    tokens (bin = cumulative-tokens-before ÷ budget — the streaming
    concatenate-and-cut packer used for pretraining batches, not
    best-fit). Returns (shard, doc_id, tok_count, offset, bin).

    `offset` is the document's token start position within its shard's
    concatenated stream — what a downstream tokenizer needs to slice
    examples without re-scanning text.
    """
    toks = docs.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col),
        n_tokens(text_col).alias("tok_count"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        toks.withColumn("cum", F.sum("tok_count").over(w))
        .withColumn("offset", (F.col("cum") - F.col("tok_count")).cast("long"))
        .withColumn("bin", F.floor(F.col("offset") / budget))
        .select("shard", id_col, "tok_count", "offset", "bin")
    )
