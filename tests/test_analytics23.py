from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics23 import (
    q_allocation_largest_remainder,
    q_association_rules,
    q_attribution_linear,
    q_doc_quality_filters,
    q_pointintime_scd2_join,
    q_trailing_zscore_anomaly,
    q_windowed_dedup,
)

SF0001 = "/root/testdata/sf0.001"


def test_allocation_sums_exactly_to_order_total(spark):
    """The whole point of largest-remainder: per-order allocated cents
    equal floor(o_totalprice*100) exactly, for every order."""
    alloc = (
        q_allocation_largest_remainder(spark, SF0001)
        .groupBy("l_orderkey")
        .agg(F.sum("alloc_cents").alias("got"))
    )
    target = load(spark, SF0001, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("want"),
    )
    # only orders that have lineitems can be allocated
    bad = alloc.join(target, "l_orderkey").filter(F.col("got") != F.col("want"))
    assert bad.count() == 0


def test_allocation_deviates_at_most_one_cent_from_proportional(spark):
    """Largest remainder never moves a line more than 1 cent from its
    exact proportional share (floor(t*w/W) <= alloc <= floor+1).

    lineitem has duplicate (l_orderkey, l_linenumber) keys (dirty by
    design), so rows can't be joined by identity; within each
    (order, linenumber) group the sorted alloc list is compared
    elementwise against the sorted floor-share list — valid because an
    elementwise-in-[f, f+1] family keeps that bound under sorting."""
    li = load(spark, SF0001, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("w"),
    )
    o = load(spark, SF0001, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("t"),
    )
    from pyspark.sql import Window

    base = (
        li.join(o, "l_orderkey")
        .withColumn("sw", F.sum("w").over(Window.partitionBy("l_orderkey")))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.expr("(t * w) div sw").alias("floor_share"),
        )
    )
    floors: dict[tuple, list] = {}
    for r in base.collect():
        floors.setdefault(
            (r["l_orderkey"], r["l_linenumber"]), []
        ).append(r["floor_share"])
    allocs: dict[tuple, list] = {}
    for r in q_allocation_largest_remainder(spark, SF0001).collect():
        allocs.setdefault(
            (r["l_orderkey"], r["l_linenumber"]), []
        ).append(r["alloc_cents"])
    assert floors.keys() == allocs.keys()
    for key, f in floors.items():
        a = sorted(allocs[key])
        f = sorted(f)
        assert len(a) == len(f)
        for got, want in zip(a, f):
            assert want <= got <= want + 1, (key, got, want)


def test_association_rules_bounds(spark):
    rows = q_association_rules(spark, SF0001).collect()
    assert rows, "support floor pruned everything at sf0.001"
    for r in rows:
        assert 0 < r["confidence_a_to_b"] <= 1.0
        assert r["n_ab"] <= min(r["n_a"], r["n_b"])
        assert r["lift"] > 0


def test_pointintime_join_unique_and_temporally_valid(spark):
    out = q_pointintime_scd2_join(spark, SF0001)
    n_purch = (
        load(spark, SF0001, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    # left join against disjoint intervals: exactly one row per purchase
    assert out.count() == n_purch
    matched = out.filter(F.col("state").isNotNull())
    assert matched.count() > 0
    # the state in effect started at or before the purchase
    assert matched.filter(F.col("state_since") > F.col("ts")).count() == 0
    assert set(
        r["state"] for r in matched.select("state").distinct().collect()
    ) <= {"click", "view"}


def test_windowed_dedup_one_row_per_bucket_key(spark):
    out = q_windowed_dedup(spark, SF0001)
    dup = (
        out.groupBy("user_id", "event_type", "bucket_start")
        .count()
        .filter(F.col("count") > 1)
    )
    assert dup.count() == 0
    # keep-first: every kept ts is inside its hour bucket
    bad = out.filter(F.date_trunc("hour", "ts") != F.col("bucket_start"))
    assert bad.count() == 0


def test_doc_quality_filters_metrics_consistent(spark):
    rows = q_doc_quality_filters(spark, SF0001).collect()
    assert rows
    for r in rows:
        assert r["n_distinct"] <= r["n_words"]
        assert r["max_freq"] >= 1
        assert 0 <= r["stopword_ratio"] <= 1
        want_keep = (
            r["n_words"] >= 20
            and 3 * r["n_words"] <= r["sum_wlen"] <= 8 * r["n_words"]
            and 5 * r["max_freq"] <= r["n_words"]
            and 10 * r["n_distinct"] >= r["n_words"]
        )
        assert r["keep"] == want_keep


def test_attribution_credits_sum_to_attributed_purchases(spark):
    """Linear attribution conserves credit: total credit across
    channels equals the number of purchases that had >=1 touch
    (each splits exactly one unit), up to the 1e-12 floor-scaling."""
    rows = q_attribution_linear(spark, SF0001).collect()
    total = sum(r["total_credit"] for r in rows)
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
        .select("event_id")
        .distinct()
        .count()
    )
    assert attributed > 0
    # floor-scaling loses < 1e-12 per (purchase, channel) share
    assert attributed - 1e-6 < total <= attributed + 1e-9


def test_trailing_zscore_flags_are_actually_extreme(spark):
    """Every flagged event deviates >3 sigma from its trailing-window
    mean, recomputed independently in Python."""
    out = q_trailing_zscore_anomaly(spark, SF0001).collect()
    assert out, "no anomalies at sf0.001"
    ev = sorted(
        load(spark, SF0001, "events")
        .select("event_id", "user_id", "ts", "value")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    hist: dict[int, list[float]] = {}
    expect = {}
    for r in ev:
        h = hist.setdefault(r["user_id"], [])
        win = h[-20:]
        n = len(win)
        if n >= 10:
            s = sum(win)
            mean = s / n
            var = sum((x - mean) ** 2 for x in win) / n
            if var >= 0 and (r["value"] - mean) ** 2 > 9 * var * (1 + 1e-9):
                expect[r["event_id"]] = True
        h.append(r["value"])
    flagged = {r["event_id"] for r in out}
    # the decimal-exact decision and the float recompute may disagree
    # only at the knife edge — require near-total agreement both ways
    overlap = len(flagged & set(expect))
    assert overlap >= 0.9 * len(flagged)
    assert overlap >= 0.9 * len(expect)
