"""Physical-plan regression tests: the optimizations the 100 TB
design depends on (broadcasts, pushdown, window-group-limit, partial
aggregation) must stay in the compiled plans — a correctness-
preserving code change that silently loses one of these is a scale
regression this file catches."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import REGISTRY

SF0001 = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF0001)
    return df._jdf.queryExecution().executedPlan().toString()


def test_star_join_broadcasts_dimensions(spark):
    plan = _plan(spark, "q_star_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must not sort-merge


def test_topk_uses_ordered_limit_not_global_sort(spark):
    plan = _plan(spark, "q_topk")
    assert "TakeOrderedAndProject" in plan


def test_tpch_q6_pushes_filters_and_prunes_columns(spark):
    plan = _plan(spark, "q_tpch_q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    # projection pruning: the 11-column lineitem scan reads few cols
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert read.count(":") <= 5


def test_grouped_agg_is_partial_then_final(spark):
    plan = _plan(spark, "q_groupby_agg")
    assert plan.count("HashAggregate") >= 2  # map-side combine present


def test_window_topk_per_group_has_group_limit(spark):
    from pyspark.sql import functions as F

    from lakehouse_ecommerce_etl_pipeline_spark.operators.windows import (
        top_k_per_group,
    )
    from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load

    df = top_k_per_group(
        load(spark, SF0001, "orders"),
        ["o_custkey"],
        [F.col("o_orderdate").desc(), F.col("o_orderkey")],
        2,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # rank-filter pushes the per-group limit into the shuffle read
    assert "WindowGroupLimit" in plan


def test_semi_join_broadcasts(spark):
    plan = _plan(spark, "q_join_leftsemi")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_grid_radius_join_is_equi_join_not_nested_loop(spark):
    plan = _plan(spark, "q_grid_radius_join")
    assert "BroadcastNestedLoopJoin" not in plan  # cell key equi-join


def test_partitioned_fact_join_gets_dynamic_partition_pruning(spark, tmp_path):
    """The 100 TB date-partitioned fact + filtered dim join must plan
    a DPP subquery: only partitions matching the dim filter are read.
    Losing this turns a one-month scan into a full-table scan."""
    from pyspark.sql import functions as F

    from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
    from lakehouse_ecommerce_etl_pipeline_spark.sinks.writer import (
        write_partitioned,
    )

    fact_src = load(spark, SF0001, "lineitem").withColumn(
        "smonth", F.date_format("l_shipdate", "yyyy-MM")
    )
    fact_path = str(tmp_path / "lineitem_by_month")
    write_partitioned(fact_src, fact_path, ["smonth"])
    fact = spark.read.parquet(fact_path)
    dim = fact_src.select(F.col("smonth").alias("m")).distinct()
    dim_path = str(tmp_path / "month_dim")
    dim.write.parquet(dim_path)
    # NOTE the dim filter must pass Spark's isLikelySelective gate
    # (EqualTo/Like/...): a bare boolean-attribute filter does NOT
    # trigger DPP insertion
    date_dim = spark.read.parquet(dim_path).filter(
        F.substring("m", 6, 2) == "01"
    )
    joined = fact.join(date_dim, fact["smonth"] == date_dim["m"]).groupBy(
        "smonth"
    ).count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_rank_machinery_has_no_single_partition_window(spark):
    """The boundary-cut de-weak contract, as a committed plan check
    (it was an ad-hoc audit in r6): in every consumer of
    operators/ranks.py, no Window operator may execute over an
    Exchange SinglePartition — 1-row scalar-aggregate merges are the
    only legitimate single-partition exchanges in these plans."""
    consumers = [
        "q_histogram_equidepth",
        "q_calibration_deciles",
        "q_quartile_contingency",
        "q_systematic_sample",
        "q_ccnet_quality_buckets",
        "q_rfm_segments",
        "q_shard_assignment_balanced",
        "q_concurrency_sweep",
        "q_abc_classification",
        "q_ks_drift",
        "q_spearman_corr",
        "q_theil_sen_trend",
    ]

    def _window_over_single_partition(plan: str) -> bool:
        lines = plan.splitlines()

        def indent(ln: str) -> int:
            return len(ln) - len(ln.lstrip(" +-:*"))

        for i, ln in enumerate(lines):
            if "Window" not in ln or "WindowGroupLimit" in ln:
                continue
            base = indent(ln)
            for sub in lines[i + 1:]:
                if sub.strip() and indent(sub) <= base:
                    break
                if "Exchange SinglePartition" in sub:
                    return True
        return False

    for name in consumers:
        plan = _plan(spark, name)
        assert not _window_over_single_partition(plan), name
