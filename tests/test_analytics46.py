from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics46 import (
    q_calibration_deciles,
    q_corpus_keep_list,
    q_scan_fixed_width,
)

SF0001 = "/root/testdata/sf0.001"


def test_fixed_width_roundtrip_exact(spark):
    got = {
        r["s_suppkey"]: r for r in q_scan_fixed_width(spark, SF0001).collect()
    }
    src = load(spark, SF0001, "supplier").collect()
    assert len(got) == len(src)
    for s in src:
        r = got[s["s_suppkey"]]
        assert r["s_name"] == s["s_name"]
        assert r["s_nationkey"] == s["s_nationkey"]
        assert r["acctbal_cents"] == round(s["s_acctbal"] * 100)


def test_keep_list_one_survivor_per_cluster_with_best_quality(spark):
    rows = q_corpus_keep_list(spark, SF0001).collect()
    docs = load(spark, SF0001, "documents").count()
    assert len(rows) == docs
    clusters = defaultdict(list)
    for r in rows:
        clusters[r["cluster"]].append(r)
    for members in clusters.values():
        kept = [r for r in members if r["keep"]]
        assert len(kept) == 1
        assert kept[0]["quality"] == max(r["quality"] for r in members)


def test_calibration_deciles_balanced_and_monotone_scores(spark):
    rows = sorted(
        q_calibration_deciles(spark, SF0001).collect(),
        key=lambda r: r["decile"],
    )
    n_orders = load(spark, SF0001, "orders").count()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert sum(r["n"] for r in rows) == n_orders
    # NTILE bucket sizes differ by at most one
    sizes = [r["n"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # mean score must strictly increase across price deciles
    scores = [r["avg_score"] for r in rows]
    assert all(a < b for a, b in zip(scores, scores[1:]))
    for r in rows:
        assert 0.0 <= r["pos_rate"] <= 1.0
        assert r["n_pos"] <= r["n"]
