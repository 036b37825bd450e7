"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 as a smoke check;
``queries()`` / ``oracle_sql()`` expose the full registered corpus
(lakehouse_ecommerce_etl_pipeline_spark/plans/) for the sf0.01 DuckDB
oracle comparison.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lakehouse_ecommerce_etl_pipeline_spark import plans as _plans  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (SURVEY.md §7 M0):
    scan → null-filter → dedup → semi-join → group-by aggregation —
    the minimum end-to-end slice through the engine."""
    from pyspark.sql import functions as F

    from lakehouse_ecommerce_etl_pipeline_spark.operators.aggregates import davg, dsum
    from lakehouse_ecommerce_etl_pipeline_spark.operators.dedup import (
        dedup_deterministic,
    )
    from lakehouse_ecommerce_etl_pipeline_spark.operators.joins import semi_join
    from lakehouse_ecommerce_etl_pipeline_spark.operators.validate import (
        split_valid_invalid,
    )

    li = spark.read.parquet(f"{SF0001}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF0001}/orders.parquet")

    valid, _ = split_valid_invalid(li, ["l_orderkey", "l_quantity", "l_shipdate"])
    deduped = dedup_deterministic(
        valid, ["l_orderkey", "l_linenumber"], ["l_partkey", "l_suppkey"]
    )
    open_orders = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    joined = semi_join(deduped, open_orders, "l_orderkey")
    return (
        joined.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            davg("l_quantity", "avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+
    extension tiers). See
    lakehouse_ecommerce_etl_pipeline_spark/plans/ for definitions."""
    return _plans.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query; rows-only
    entries (side-effecting sinks, streaming state, engine-specific
    hashes) intentionally omitted."""
    return _plans.oracle_sql()
