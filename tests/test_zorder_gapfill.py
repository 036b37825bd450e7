from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.operators.zorder import (
    zorder_cluster,
    zvalue_column,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics9 import q_gapfill_locf

SF0001 = "/root/testdata/sf0.001"


def _morton(x: int, y: int, bits: int = 10) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_python_morton(spark):
    rows = (
        spark.range(200)
        .select(
            (F.col("id") * 37 % 1024).alias("x"),
            (F.col("id") * 101 % 1024).alias("y"),
        )
        .withColumn("z", zvalue_column("x", "y", 10))
        .collect()
    )
    for r in rows:
        assert r["z"] == _morton(r["x"], r["y"])


def test_zorder_files_bound_both_dimensions(spark):
    # uniform grid: after Z-clustering into 16 range partitions, every
    # partition's bounding box must be tight in BOTH x and y — the
    # property linear sort (tight x, full-range y) cannot give
    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    clustered = zorder_cluster(df, "x", "y", bits=6, n_files=16)
    stats = (
        clustered.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("xr"),
            (F.max("y") - F.min("y")).alias("yr"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert sum(r["n"] for r in stats) == 4096
    nonempty = [r for r in stats if r["n"] > 0]
    # 16 Z-range partitions over a 64x64 grid -> each box spans at most
    # half the domain in each dimension (perfect quarters are 16x16)
    assert max(r["xr"] for r in nonempty) <= 32
    assert max(r["yr"] for r in nonempty) <= 32


def test_gapfill_grid_is_contiguous_and_locf_holds(spark):
    out = q_gapfill_locf(spark, SF0001)
    per_user = (
        out.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("hour_bucket").alias("hmin"),
            F.max("hour_bucket").alias("hmax"),
        )
        .collect()
    )
    for r in per_user:
        assert r["n"] == r["hmax"] - r["hmin"] + 1  # dense hour grid
    # first row per user is observed, so filled_value is never null
    assert out.filter(F.col("filled_value").isNull()).count() == 0
    # gap rows (n_obs = 0) exist and carry a value forward
    assert out.filter((F.col("n_obs") == 0) & F.col("filled_value").isNotNull()).count() > 0
