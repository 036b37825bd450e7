from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics20 import (
    q_chi2_independence,
    q_minhash_estimate_quality,
    q_time_to_convert,
)

SF0001 = "/root/testdata/sf0.001"


def test_chi2_statistic_nonnegative_with_correct_dof(spark):
    r = q_chi2_independence(spark, SF0001).first()
    assert r["chi2_stat"] >= 0.0
    assert r["dof"] == (3 - 1) * (5 - 1)
    assert r["n"] > 0


def test_minhash_estimate_tracks_true_jaccard(spark):
    rows = q_minhash_estimate_quality(spark, SF0001).collect()
    assert rows
    n_exact = 0
    for r in rows:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["true_jaccard"] <= 1.0
        if abs(r["est_jaccard"] - r["true_jaccard"]) <= 0.35:
            n_exact += 1
    # the estimator is unbiased: the vast majority of candidate pairs
    # estimate within a coarse band of truth even at 8 permutations
    assert n_exact >= 0.8 * len(rows)


def test_time_to_convert_percentiles_ordered(spark):
    r = q_time_to_convert(spark, SF0001).first()
    assert r["n_converted"] > 0
    assert 0 <= r["median_s"] <= r["p90_s"]


def test_moving_median_first_row_equals_value(spark):
    from pyspark.sql import functions as F

    from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics20 import (
        q_moving_median,
    )

    mm = q_moving_median(spark, SF0001)
    first = (
        load(spark, SF0001, "events")
        .groupBy("user_id")
        .agg(F.min_by("event_id", F.struct("ts", "event_id")).alias("event_id"))
    )
    joined = mm.join(first, ["user_id", "event_id"]).collect()
    assert joined
    for r in joined:
        assert r["moving_median"] == r["value"]  # 1-row frame
