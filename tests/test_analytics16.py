from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics16 import (
    q_integer_islands,
    q_median_mad_outliers,
    q_mode_per_group,
    q_mom_growth,
    q_pagerank,
    q_triangle_count,
)

SF0001 = "/root/testdata/sf0.001"


def test_mad_outliers_actually_deviate(spark):
    rows = q_median_mad_outliers(spark, SF0001).collect()
    for r in rows:
        assert abs(r["c_acctbal"] - r["seg_median"]) > 1.5 * r["seg_mad"]


def test_islands_are_disjoint_and_cover_all_minutes(spark):
    rows = sorted(
        q_integer_islands(spark, SF0001).collect(),
        key=lambda r: r["island_start"],
    )
    assert rows
    total = 0
    for prev, cur in zip(rows, rows[1:]):
        # a gap of at least one missing minute separates islands
        assert cur["island_start"] > prev["island_end"] + 1
    for r in rows:
        assert r["n_minutes"] == r["island_end"] - r["island_start"] + 1
        total += r["n_minutes"]
    n_minutes = (
        load(spark, SF0001, "events")
        .select(F.expr("unix_timestamp(date_trunc('minute', ts)) div 60"))
        .distinct()
        .count()
    )
    assert total == n_minutes


def test_mom_growth_matches_revenue_ratio(spark):
    rows = sorted(q_mom_growth(spark, SF0001).collect(), key=lambda r: r["month"])
    assert rows[0]["mom_growth"] is None
    for prev, cur in zip(rows, rows[1:]):
        want = (cur["revenue"] - prev["revenue"]) / prev["revenue"]
        assert math.isclose(cur["mom_growth"], want, rel_tol=1e-12)


def test_mode_is_the_max_count_value(spark):
    modes = {
        r["l_returnflag"]: (r["modal_quantity"], r["n_lines"])
        for r in q_mode_per_group(spark, SF0001).collect()
    }
    counts = (
        load(spark, SF0001, "lineitem")
        .groupBy("l_returnflag", "l_quantity")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    best: dict[str, int] = {}
    for r in counts:
        best[r["l_returnflag"]] = max(best.get(r["l_returnflag"], 0), r["n"])
    for flag, (_, n) in modes.items():
        assert n == best[flag]


def test_triangle_count_nonnegative_and_bounded(spark):
    n_tri = q_triangle_count(spark, SF0001).first()["n_triangles"]
    assert n_tri >= 0
    # every triangle needs 3 distinct co-purchase edges
    d = (
        load(spark, SF0001, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = d.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = d.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    n_edges = (
        a.join(b, "ok").filter(F.col("pa") < F.col("pb")).select("pa", "pb")
        .distinct().count()
    )
    assert n_tri <= n_edges * n_edges


def test_pagerank_mass_and_positivity(spark):
    rows = q_pagerank(spark, SF0001).collect()
    assert rows
    for r in rows:
        assert r["pagerank"] > 0
    # total mass stays ~1 on a symmetric (dangling-free) graph
    assert math.isclose(sum(r["pagerank"] for r in rows), 1.0, rel_tol=1e-6)
