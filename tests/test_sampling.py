"""Selection-layer invariants: split determinism under repartition,
packing budget/offset arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.llm.sampling import (
    deterministic_split,
    pack_sequences,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load

SF = "/root/testdata/sf0.001"


def test_split_stable_under_repartition(spark):
    docs = load(spark, SF, "documents")
    a = {(r.doc_id, r.split) for r in deterministic_split(docs, "doc_id").collect()}
    b = {
        (r.doc_id, r.split)
        for r in deterministic_split(docs.repartition(13), "doc_id").collect()
    }
    assert a == b
    splits = {s for _, s in a}
    assert splits <= {"train", "val"} and "train" in splits


def test_split_threshold_monotone(spark):
    """A wider threshold's val set must contain the narrower one's."""
    docs = load(spark, SF, "documents")
    small = {
        r.doc_id
        for r in deterministic_split(docs, "doc_id", threshold_hex="1").collect()
        if r.split == "val"
    }
    big = {
        r.doc_id
        for r in deterministic_split(docs, "doc_id", threshold_hex="8").collect()
        if r.split == "val"
    }
    assert small <= big
    assert len(big) > len(small)


def test_pack_sequences_offsets_and_bins(spark):
    docs = load(spark, SF, "documents")
    out = pack_sequences(docs, budget=128).collect()
    by_shard: dict[str, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert sum(len(v) for v in by_shard.values()) == docs.count()
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.doc_id)
        cum = 0
        prev_bin = 0
        for r in rows:
            # offset = tokens laid out before this doc, in id order
            assert r.offset == cum
            assert r.bin == r.offset // 128
            assert r.bin >= prev_bin  # bins are consecutive per shard
            cum += r.tok_count
            prev_bin = r.bin


def test_stratified_sample_rates_and_determinism(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.llm.sampling import (
        stratified_sample,
    )

    docs = load(spark, SF, "documents")
    kept = stratified_sample(
        docs, "doc_id", "source", {"src0": "g", "src1": "2"}, default_threshold="0"
    )
    rows = kept.collect()
    # 'g' keeps every src0 row; '0' drops every other-source row
    n_src0 = docs.filter(F.col("source") == "src0").count()
    assert sum(1 for r in rows if r.source == "src0") == n_src0
    assert {r.source for r in rows} <= {"src0", "src1"}
    # determinism under repartition
    again = stratified_sample(
        docs.repartition(7), "doc_id", "source", {"src0": "g", "src1": "2"}, "0"
    )
    assert {r.doc_id for r in rows} == {r.doc_id for r in again.collect()}
