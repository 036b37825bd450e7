from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics22 import (
    q_concurrency_sweep,
    q_setsim_prefix_join,
)

SF0001 = "/root/testdata/sf0.001"


def test_sweep_bounds(spark):
    rows = q_concurrency_sweep(spark, SF0001).collect()
    assert rows
    n_users = load(spark, SF0001, "events").select("user_id").distinct().count()
    for r in rows:
        # one user's sessions are disjoint intervals, so concurrency
        # can never exceed the user count; -1-before-+1 tie order can
        # transiently dip to -1 on a leading zero-length session
        assert -1 <= r["max_concurrency"] <= n_users


def test_sweep_hand_example(spark):
    """Two users with overlapping sessions in one hour -> max 2."""
    import datetime as dt

    ev = spark.createDataFrame(
        [
            (1, 10, dt.datetime(2024, 1, 1, 10, 0, 0)),
            (2, 10, dt.datetime(2024, 1, 1, 10, 5, 0)),
            (3, 20, dt.datetime(2024, 1, 1, 10, 2, 0)),
            (4, 20, dt.datetime(2024, 1, 1, 10, 8, 0)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    from lakehouse_ecommerce_etl_pipeline_spark.operators.windows import sessionize

    sess = sessionize(ev, "user_id", "ts", 1800, order_tiebreak=["event_id"])
    iv = (
        sess.withColumn("tus", F.expr("unix_micros(ts)"))
        .groupBy("user_id", "session_id")
        .agg(F.min("tus").alias("st"), F.max("tus").alias("en"))
    )
    assert iv.count() == 2  # one session per user, both open 10:02-10:05
    sweep = iv.select(F.col("st").alias("t"), F.lit(1).alias("d")).unionByName(
        iv.select(F.col("en").alias("t"), F.lit(-1).alias("d"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("t", "d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    mx = sweep.withColumn("c", F.sum("d").over(w)).agg(F.max("c")).first()[0]
    assert mx == 2


def test_setsim_results_meet_threshold_and_are_consistent(spark):
    rows = q_setsim_prefix_join(spark, SF0001).collect()
    assert rows
    for r in rows[:200]:
        assert 3 * r["inter_sz"] >= r["inter_sz"] + r["union_sz"]  # J>=0.5
        assert r["union_sz"] >= r["inter_sz"] > 0
        assert abs(r["jaccard"] - r["inter_sz"] / r["union_sz"]) < 1e-12
        assert r["id_a"] < r["id_b"]


def test_setsim_prefix_filter_is_lossless_vs_brute_force(spark):
    """On a synthetic mini-corpus with known near-dups, the filtered
    join returns exactly the brute-force J>=0.5 pairs."""
    from lakehouse_ecommerce_etl_pipeline_spark.llm.dedup import tokens

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps"),
            (1, "the quick brown fox leaps"),   # J(0,1)=4/6=0.67
            (2, "a completely different text"),
            (3, "a completely different text"),  # J(2,3)=1.0
            (4, "quick brown"),                  # J(0,4)=2/5=0.4 (out)
        ],
        "doc_id long, text string",
    )
    tok = tokens(docs, "doc_id", "text")
    ta = tok.select(F.col("doc_id").alias("id_a"), "tok")
    tb = tok.select(F.col("doc_id").alias("id_b"), "tok")
    sz = tok.groupBy("doc_id").count()
    szm = {r["doc_id"]: r["count"] for r in sz.collect()}
    inter = (
        ta.join(tb, "tok")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
        .collect()
    )
    expected = {
        (r["id_a"], r["id_b"])
        for r in inter
        if 3 * r["i"] >= szm[r["id_a"]] + szm[r["id_b"]]
    }
    assert expected == {(0, 1), (2, 3)}


def test_setsim_size_gate_shuffle_path_matches_broadcast(spark, monkeypatch):
    """The vocab-rank join's size gate (r8): forcing the threshold to
    0 takes the shuffle-hash branch (web-scale vocab path); the result
    must equal the broadcast branch exactly, AND the gate must show in
    the plan — a silently inverted/ignored gate would keep values
    identical while reverting the web-scale path to broadcasting a
    10^7-row rank table."""
    monkeypatch.setenv("SPARK_GRAFT_SETSIM_MAX_BCAST_VOCAB", "0")
    shuffled = q_setsim_prefix_join(spark, SF0001)
    # the shuffle_hash hint took effect: the rank join is a
    # ShuffledHashJoin in the forced-shuffle plan
    assert "ShuffledHashJoin" in (
        shuffled._jdf.queryExecution().executedPlan().toString()
    )
    monkeypatch.setenv("SPARK_GRAFT_SETSIM_MAX_BCAST_VOCAB", "10000000")
    broadcast = q_setsim_prefix_join(spark, SF0001)
    assert "ShuffledHashJoin" not in (
        broadcast._jdf.queryExecution().executedPlan().toString()
    )
    assert shuffled.count() == broadcast.count()
    assert shuffled.exceptAll(broadcast).count() == 0
    assert broadcast.exceptAll(shuffled).count() == 0
