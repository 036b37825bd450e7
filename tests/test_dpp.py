"""Dynamic partition pruning: a selective dimension filter must turn
into runtime partition pruning on the partitioned fact scan — the
mechanism that makes star joins over date-partitioned 100 TB facts
read only the partitions the dimension selects."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    fact_path = str(tmp_path / "fact_part")
    from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load

    orders = load(spark, SF0001, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.trunc("o_orderdate", "month").alias("order_month"),
    )
    orders.repartition("order_month").write.partitionBy("order_month").parquet(
        fact_path
    )
    fact = spark.read.parquet(fact_path)

    # calendar dim with a non-partition attribute; the runtime filter
    # on that attribute is what DPP pushes into the fact scan (a bare
    # LIMIT or an unfiltered dim does not qualify)
    dim_path = str(tmp_path / "dim_months")
    orders.select("order_month").distinct().withColumn(
        "year_tag", F.year("order_month")
    ).write.parquet(dim_path)
    dim = spark.read.parquet(dim_path)
    first_year = dim.agg(F.min("year_tag")).first()[0]

    joined = fact.join(
        dim.filter(F.col("year_tag") == first_year), "order_month"
    ).agg(F.count("*").alias("n"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    # and the result is what a plain predicate computes
    expect = fact.filter(F.year("order_month") == first_year).count()
    assert joined.first()["n"] == expect
