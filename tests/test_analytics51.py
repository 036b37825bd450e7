"""Tier LI + LLM XVI: CDC-retraction aggregate maintenance invariants
and the bigram-LM / portable-SimHash corpus scorers.

The sf-dir oracles (scripts/check_oracle.py) already pin values; these
tests pin the *operator-level* invariants on hand-built frames where
the expected behavior is enumerable by hand: incremental ≡ recompute
under all three change kinds, zero-delta no-ops, count-to-zero
eviction, and the LM scorer's ordering/smoothing semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.operators.cdc import (
    CHANGE_COL,
    table_changes,
)


def _maintain(base_agg, feed):
    """The signed-delta maintenance step of q_cdc_agg_maintenance,
    inlined for frame-level testing (plans/analytics51.py)."""
    sign = F.when(
        F.col(CHANGE_COL).isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = feed.groupBy("k").agg(
        F.sum(sign).cast("bigint").alias("d_cnt"),
        F.sum(sign * F.col("cents")).cast("bigint").alias("d_cents"),
    )
    return (
        base_agg.join(delta, "k", "full_outer")
        .select(
            "k",
            (F.coalesce("cnt", F.lit(0)) + F.coalesce("d_cnt", F.lit(0))).alias(
                "cnt"
            ),
            (
                F.coalesce("cents_sum", F.lit(0)) + F.coalesce("d_cents", F.lit(0))
            ).alias("cents_sum"),
        )
        .filter(F.col("cnt") > 0)
    )


def _agg(df):
    return df.groupBy("k").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("cents").cast("bigint").alias("cents_sum"),
    )


def test_cdc_maintenance_equals_recompute(spark):
    # group A: one row updated; group B: fully deleted (must evict);
    # group C: untouched; group D: insert-only new group
    base = spark.createDataFrame(
        [(1, "A", 100), (2, "A", 200), (3, "B", 300)],
        "id int, k string, cents long",
    )
    final = spark.createDataFrame(
        [(1, "A", 150), (2, "A", 200), (4, "D", 400)],
        "id int, k string, cents long",
    )
    feed = table_changes(base, final, ["id"])
    maintained = _maintain(_agg(base), feed)
    expect = {("A", 2, 350), ("D", 1, 400)}
    assert {
        (r.k, r.cnt, r.cents_sum) for r in maintained.collect()
    } == expect
    # invariant: maintained ≡ direct recompute of the final snapshot
    assert {
        (r.k, r.cnt, r.cents_sum) for r in _agg(final).collect()
    } == expect


def test_cdc_maintenance_empty_feed_is_noop(spark):
    base = spark.createDataFrame(
        [(1, "A", 100), (2, "B", 200)], "id int, k string, cents long"
    )
    feed = table_changes(base, base, ["id"])
    assert feed.count() == 0
    out = {(r.k, r.cnt, r.cents_sum) for r in _maintain(_agg(base), feed).collect()}
    assert out == {("A", 1, 100), ("B", 1, 200)}


def test_simhash_portable_matches_reference_bits(spark):
    """One-token docs: the fingerprint must equal the low 32 bits of
    the md5-derived hash exactly (every bit's single vote is its own
    majority) — pins hash derivation + packing bit order."""
    import hashlib

    from lakehouse_ecommerce_etl_pipeline_spark.llm.dedup import simhash

    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id int, text string"
    )
    got = {
        r.doc_id: r.simhash
        for r in simhash(docs, "doc_id", "text", bits=32, portable=True).collect()
    }
    for doc_id, tok in [(1, "alpha"), (2, "beta"), (3, "gamma")]:
        h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
        assert got[doc_id] == h, (doc_id, tok)


def test_lm_score_prefers_frequent_transitions(spark):
    """A document repeating the corpus-dominant bigram must outscore
    (per bigram) one made of a transition seen nowhere else."""
    from lakehouse_ecommerce_etl_pipeline_spark.plans.llm16 import q_lm_score_docs

    import os
    import tempfile

    rows = [(i, "the cat sat") for i in range(10)] + [(99, "zx qv")]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).write.parquet(os.path.join(td, "documents.parquet"))
        out = {r.doc_id: r for r in q_lm_score_docs(spark, td).collect()}
    common = out[0]
    rare = out[99]
    assert common.n_bigrams == 2 and rare.n_bigrams == 1
    # per-bigram average score: dominant transitions >> unique one
    assert common.lm_score_q / common.n_bigrams > rare.lm_score_q
    # smoothing floor: unseen-but-scored bigram still gets > 0
    assert rare.lm_score_q > 0
