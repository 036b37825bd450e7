from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics19 import (
    q_cumulative_distinct_users,
    q_knn_classify,
    q_label_centroids,
    q_sliding_distinct_users,
)

SF0001 = "/root/testdata/sf0.001"


def test_cumulative_distinct_reaches_total_users(spark):
    rows = sorted(
        q_cumulative_distinct_users(spark, SF0001).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    assert rows[-1]["cum_users"] == (
        load(spark, SF0001, "events").select("user_id").distinct().count()
    )
    cums = [r["cum_users"] for r in rows]
    assert cums == sorted(cums)
    assert sum(r["new_users"] for r in rows) == cums[-1]


def test_sliding_distinct_bounds_daily_distinct(spark):
    daily = {
        r["day"]: r["n"]
        for r in load(spark, SF0001, "events")
        .select(F.col("ts").cast("date").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for r in q_sliding_distinct_users(spark, SF0001).collect():
        # trailing window is a superset of the single day's users
        assert r["trailing3d_users"] >= daily.get(r["day"], 0)


def test_label_centroids_shape_and_range(spark):
    rows = q_label_centroids(spark, SF0001).collect()
    emb = load(spark, SF0001, "embeddings")
    n_labels = emb.select("label").distinct().count()
    assert len(rows) == n_labels * 64
    lo, hi = emb.select(
        F.min(F.array_min("embedding")), F.max(F.array_max("embedding"))
    ).first()
    for r in rows:
        assert lo - 1e-9 <= r["centroid"] <= hi + 1e-9


def test_knn_predicts_for_all_queries_with_valid_labels(spark):
    rows = q_knn_classify(spark, SF0001).collect()
    assert len(rows) == 20
    labels = {
        r["label"]
        for r in load(spark, SF0001, "embeddings").select("label").distinct().collect()
    }
    for r in rows:
        assert r["pred_label"] in labels
        assert 1 <= r["n_votes"] <= 3
