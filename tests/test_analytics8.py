from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics8 import (
    q_higher_order_fns,
    q_incremental_agg_merge,
    q_multimodal_bytestats,
    q_props_map_explode,
)

SF0001 = "/root/testdata/sf0.001"


def test_bytestats_digest_and_length_match_hashlib(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, SF0001, "documents").select("doc_id", "text").collect()
    }
    out = q_multimodal_bytestats(spark, SF0001).collect()
    assert len(out) == len(docs)
    for row in out[:25]:
        raw = docs[row["content_id"]].encode("utf-8")
        assert row["n_bytes"] == len(raw)
        assert row["digest"] == hashlib.md5(raw).hexdigest()
        assert row["fmt"] in {"png", "jpeg", "webp"}


def test_higher_order_fns_match_python_recompute(spark):
    out = {r["doc_id"]: r for r in q_higher_order_fns(spark, SF0001).collect()}
    texts = load(spark, SF0001, "documents").select("doc_id", "text").collect()
    for r in texts[:25]:
        lens = [len(t) for t in r["text"].split(" ")]
        got = out[r["doc_id"]]
        assert got["total_token_chars"] == sum(lens)
        assert got["n_long_tokens"] == sum(1 for n in lens if n >= 6)
        assert got["longest_token"] == max(lens)
        assert got["sum_sq_token_chars"] == sum(n * n for n in lens)


def test_props_map_explode_preserves_event_count(spark):
    ev = load(spark, SF0001, "events")
    # every props value is a single-key JSON object, so exploding maps
    # must keep exactly one row per event
    total = q_props_map_explode(spark, SF0001).agg(F.sum("n_events")).first()[0]
    assert total == ev.count()


def test_incremental_merge_equals_recompute(spark):
    direct = (
        load(spark, SF0001, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_orderpriority")
        .collect()
    )
    merged = q_incremental_agg_merge(spark, SF0001).collect()
    assert [tuple(r) for r in merged] == [tuple(r) for r in direct]


def test_dedup_minby_equals_window_form(spark):
    """The aggregation dedup and the window dedup must agree row-for-row
    under a total order (the scale-path equivalence analytics53 rests
    on)."""
    from lakehouse_ecommerce_etl_pipeline_spark.operators.dedup import (
        dedup_deterministic,
        dedup_minby,
    )

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    a = dedup_minby(o, ["o_custkey"], ["o_totalprice", "o_orderkey"])
    b = dedup_deterministic(o, ["o_custkey"], ["o_totalprice", "o_orderkey"])
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.count() == o.select("o_custkey").distinct().count()
