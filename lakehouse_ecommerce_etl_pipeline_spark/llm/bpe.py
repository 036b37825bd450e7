"""Distributed BPE (byte-pair-encoding) vocabulary training.

The real tokenizer-training loop, Spark-shaped: the corpus-scale work
(pair counting over every word occurrence) is a map-side-combined
aggregation, while the O(1)-size decision (which pair merges next)
round-trips through the driver — exactly the split a production
distributed BPE trainer makes (count in the cluster, decide centrally,
broadcast the merge back out).

Semantics: classic greedy BPE over whitespace words (Sennrich et al.
2016, public algorithm) — start from characters, repeatedly merge the
globally most frequent adjacent symbol pair (ties broken
lexicographically), rewriting each word left-to-right greedily. The
left-to-right fold matches the reference implementation's sequential
re-pairing on overlaps ("aaa" under (a,a) → ["aa","a"]).

100 TB: each round is ONE shuffle (pair counts over the deduped
word×count table — dedup first: pair counting is per distinct word,
weighted by occurrence count, so the working set is the vocabulary,
not the corpus); the symbol table is persisted per generation with the
previous generation dropped (the q_pagerank loop discipline), and the
merge decision is a top-1 of a tiny aggregated domain. Byte-level BPE
at corpus scale adds nothing structural — just a bigger alphabet.

reference: the reference has no tokenizer; this is north-star text
analysis (BASELINE.json) alongside q_bpe_token_count, which *applies*
a BPE-ish regex — this module *trains* the merge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _chars(col: str) -> F.Column:
    """Split a word into single-character symbols (JVM-side)."""
    return F.expr(
        f"transform(sequence(1, length({col})), i -> substring({col}, i, 1))"
    )


def _adjacent_pairs(sym_col: str) -> F.Column:
    """All adjacent symbol pairs of one word as an array of structs."""
    return F.expr(
        f"transform(sequence(1, size({sym_col}) - 1), "
        f"i -> struct(element_at({sym_col}, i) AS l, "
        f"element_at({sym_col}, i + 1) AS r))"
    )


def _merge_pair(sym: F.Column, left: str, right: str) -> F.Column:
    """Greedy left-to-right merge of (left, right) into one symbol via
    an array fold: append each symbol unless it completes the pair with
    the accumulator's tail, in which case replace the tail with the
    merged symbol. The fold's sequential order IS the greedy order."""
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    spark: SparkSession, docs: DataFrame, n_merges: int = 8
) -> list[dict]:
    """Train ``n_merges`` BPE merges over ``docs.text``; returns the
    merge table as a list of dicts (step, left, right, merged,
    pair_count) — deterministic for a fixed corpus."""
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    syms = words.select("wc", _chars("word").alias("s")).persist()
    syms.count()

    merges: list[dict] = []
    for step in range(1, n_merges + 1):
        top = (
            syms.filter(F.size("s") >= 2)
            .select("wc", F.explode(_adjacent_pairs("s")).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("wc").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, cnt = top[0]["l"], top[0]["r"], top[0]["cnt"]
        merges.append(
            {
                "step": step,
                "left": l,
                "right": r,
                "merged": l + r,
                "pair_count": int(cnt),
            }
        )
        nxt = syms.select("wc", _merge_pair(F.col("s"), l, r).alias("s")).persist()
        nxt.count()
        syms.unpersist()
        syms = nxt
    syms.unpersist()
    return merges


def merge_table_df(
    spark: SparkSession, docs: DataFrame, n_merges: int = 8
) -> DataFrame:
    """The trained merge table as a DataFrame (for queries())."""
    rows = train_bpe(spark, docs, n_merges)
    return spark.createDataFrame(
        rows,
        schema="step int, left string, right string, merged string, pair_count bigint",
    ).select("step", "left", "right", "merged", "pair_count")


def encode_corpus(
    spark: SparkSession, docs: DataFrame, merges: list[dict]
) -> DataFrame:
    """Apply a trained merge table to every document — the tokenizer
    APPLY step that turns the trained merges into corpus token counts.

    Scale design: the merge rules are inlined as plan literals (the
    merge table is tiny — it is the *model*), and encoding runs once
    per DISTINCT word, not once per occurrence: vocabulary-sized work
    joined back to the (doc, word) occurrence stream — the same
    factorization a production tokenizer service uses, because corpus
    word frequency is Zipfian. Each merge is one JVM array fold
    (_merge_pair, greedy left-to-right); n_merges folds chain inside a
    single whole-stage-codegen'd projection — no Python, no shuffle in
    the encode itself. Returns (doc_id, n_tokens, n_chars, n_multi):
    token count, character conservation check, multi-char token count.
    """
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.length("word") > 0)

    vocab = words.select("word").distinct()
    sym = F.col("s")
    enc = vocab.withColumn("s", _chars("word"))
    for m in merges:
        enc = enc.withColumn("s", _merge_pair(sym, m["left"], m["right"]))
    enc = enc.select(
        "word",
        F.size("s").cast("long").alias("w_tokens"),
        F.aggregate(
            F.col("s"), F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        ).alias("w_chars"),
        F.size(F.filter(F.col("s"), lambda x: F.length(x) > 1))
        .cast("long")
        .alias("w_multi"),
    )
    return (
        words.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("w_tokens").alias("n_tokens"),
            F.sum("w_chars").alias("n_chars"),
            F.sum("w_multi").alias("n_multi"),
        )
    )
