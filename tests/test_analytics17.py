from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics17 import (
    q_countmin_heavy_hitters,
    q_multimodal_framehash,
    q_reservoir_per_group,
    q_salted_aggregate,
    q_winsorized_mean,
)

SF0001 = "/root/testdata/sf0.001"


def test_salted_aggregate_equals_direct(spark):
    got = {
        r["l_returnflag"]: (r["sum_price"], r["n_lines"])
        for r in q_salted_aggregate(spark, SF0001).collect()
    }
    want = {
        r["l_returnflag"]: (r["sum_price"], r["n_lines"])
        for r in load(spark, SF0001, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(30,8)"))
            .cast("double")
            .alias("sum_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .collect()
    }
    assert got == want  # bit-identical: decimal sums are associative


def test_winsorized_mean_between_bounds(spark):
    cust = load(spark, SF0001, "customer")
    plain = {
        r["c_mktsegment"]: r["m"]
        for r in cust.groupBy("c_mktsegment")
        .agg(F.avg("c_acctbal").alias("m"))
        .collect()
    }
    lo_hi = {
        r["c_mktsegment"]: (r["lo"], r["hi"])
        for r in cust.groupBy("c_mktsegment")
        .agg(F.min("c_acctbal").alias("lo"), F.max("c_acctbal").alias("hi"))
        .collect()
    }
    for r in q_winsorized_mean(spark, SF0001).collect():
        lo, hi = lo_hi[r["c_mktsegment"]]
        assert lo <= r["winsorized_mean"] <= hi
        # clamping pulls the mean toward the center, never past the raw range
        assert abs(r["winsorized_mean"] - plain[r["c_mktsegment"]]) < (hi - lo)


def test_cms_estimate_upper_bounds_true_count(spark):
    rows = q_countmin_heavy_hitters(spark, SF0001).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["cms_est"] >= r["true_cnt"] > 0


def test_reservoir_exact_k_per_group(spark):
    rows = q_reservoir_per_group(spark, SF0001).collect()
    by_seg: dict[str, int] = {}
    for r in rows:
        by_seg[r["c_mktsegment"]] = by_seg.get(r["c_mktsegment"], 0) + 1
        assert 1 <= r["rk"] <= 5
    n_segs = (
        load(spark, SF0001, "customer").select("c_mktsegment").distinct().count()
    )
    assert len(by_seg) == n_segs
    assert all(v == 5 for v in by_seg.values())


def test_framehash_stride_and_coverage(spark):
    rows = q_multimodal_framehash(spark, SF0001).collect()
    assert rows
    assert all(r["frame_idx"] % 4 == 0 for r in rows)
    # every document contributes at least frame 0
    n_docs = load(spark, SF0001, "documents").count()
    zero_frames = sum(1 for r in rows if r["frame_idx"] == 0)
    assert zero_frames == n_docs
    assert all(len(r["frame_digest"]) == 32 for r in rows)
