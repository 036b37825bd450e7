from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.llm7 import (
    q_hard_negatives,
    q_negative_sampling,
    q_stream_interval_join_outer,
)

SF0001 = "/root/testdata/sf0.001"


def test_negative_sampling_k_per_doc_no_self(spark):
    out = q_negative_sampling(spark, SF0001)
    n_docs = load(spark, SF0001, "documents").count()
    per = out.groupBy("doc_id").count().collect()
    assert len(per) == n_docs
    assert all(r["count"] == 3 for r in per)
    assert out.filter(F.col("doc_id") == F.col("neg_id")).count() == 0
    # deterministic: rerun produces identical pairs
    a = {(r["doc_id"], r["neg_id"], r["rk"]) for r in out.collect()}
    b = {
        (r["doc_id"], r["neg_id"], r["rk"])
        for r in q_negative_sampling(spark, SF0001).collect()
    }
    assert a == b


def test_hard_negatives_are_cross_label_and_hardest(spark):
    out = q_hard_negatives(spark, SF0001).collect()
    emb = {
        r["vec_id"]: (r["label"], [float(x) for x in r["embedding"]])
        for r in load(spark, SF0001, "embeddings").collect()
    }
    for r in out:
        assert emb[r["vec_id"]][0] != r["neg_label"]
        assert 1 <= r["rk"] <= 3
    # spot-check one query id in Python: its rank-1 negative has the
    # max quantized cosine among cross-label candidates
    import math

    def qcos(a, b):
        za = [math.floor(x * 1000) for x in a]
        zb = [math.floor(x * 1000) for x in b]
        dot = sum(x * y for x, y in zip(za, zb))
        na = sum(x * x for x in za)
        nb = sum(x * x for x in zb)
        return dot / math.sqrt(na * nb)

    qid = min(r["vec_id"] for r in out)
    lbl, qv = emb[qid]
    best = max(
        (
            (qcos(qv, v), -nid)
            for nid, (l2, v) in emb.items()
            if l2 != lbl
        ),
    )
    got1 = next(
        r for r in out if r["vec_id"] == qid and r["rk"] == 1
    )
    assert abs(got1["cos"] - best[0]) < 1e-12
    assert got1["neg_id"] == -best[1]


def test_outer_interval_join_null_rows_respect_watermark(spark):
    out = q_stream_interval_join_outer(spark, SF0001)
    ev = load(spark, SF0001, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    nulls = out.filter(F.col("right_id").isNull())
    assert nulls.count() > 0, "expected some unmatched views"
    # every null-padded view's interval closed before the final watermark
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("left_id"), F.col("ts").alias("v_ts")
    )
    j = nulls.join(views, "left_id")
    late = j.filter(
        F.col("v_ts") + F.expr("INTERVAL 2 HOURS") > F.lit(max_ts)
    )
    assert late.count() == 0
    # matched rows have non-negative lag within the horizon
    matched = out.filter(F.col("right_id").isNotNull())
    assert matched.filter(
        (F.col("lag_micros") < 0) | (F.col("lag_micros") >= 3_600_000_000)
    ).count() == 0


def test_first_last_touch_conserve_attributed_purchases(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.llm7 import (
        q_attribution_first_last,
    )

    rows = q_attribution_first_last(spark, SF0001).collect()
    first_total = sum(r["first_touch_credits"] for r in rows)
    last_total = sum(r["last_touch_credits"] for r in rows)
    # both models assign exactly one credit per attributed purchase
    assert first_total == last_total
    ev = load(spark, SF0001, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    t = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("tu"), F.col("ts").alias("tts")
    )
    attributed = (
        p.join(
            t,
            (F.col("tu") == F.col("pu"))
            & (F.col("tts") < F.col("pts"))
            & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 24 HOURS")),
            "leftsemi",
        )
        .count()
    )
    assert first_total == attributed
