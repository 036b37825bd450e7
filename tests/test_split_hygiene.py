"""Structural invariants for the tier-XXIX split policies (value
parity is covered by the DuckDB oracles; these pin the properties the
policies exist to provide)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans.llm29 import (
    q_ccnet_quality_buckets,
    q_split_by_cluster_leakage_safe,
)

SF = "/root/testdata/sf0.001"


def test_cluster_split_is_leakage_safe(spark):
    out = q_split_by_cluster_leakage_safe(spark, SF)
    # every cluster maps to exactly one split — the whole point
    straddlers = (
        out.groupBy("cluster")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddlers == 0
    # train dominates (90% of hash space); at sf0.001's cluster count
    # the 5% buckets may legitimately come up empty
    sizes = {r["split"]: r["n"] for r in
             out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) <= {"train", "val", "test"} and "train" in sizes
    assert sizes["train"] > sum(n for s, n in sizes.items() if s != "train")


def test_quality_buckets_equal_depth(spark):
    out = q_ccnet_quality_buckets(spark, SF)
    sizes = {r["bucket"]: r["n"] for r in
             out.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == {"head", "middle", "tail"}
    assert max(sizes.values()) - min(sizes.values()) <= 1  # NTILE depth
    # head ranks strictly above tail on the score
    agg = out.groupBy("bucket").agg(F.min("per_bigram_q").alias("lo"),
                                    F.max("per_bigram_q").alias("hi"))
    m = {r["bucket"]: r for r in agg.collect()}
    assert m["head"]["lo"] >= m["middle"]["hi"]
    assert m["middle"]["lo"] >= m["tail"]["hi"]
