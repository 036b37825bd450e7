from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics11 import (
    q_lateral_topk,
    q_recursive_month_series,
)

SF0001 = "/root/testdata/sf0.001"


def test_month_series_is_dense_and_conserves_orders(spark):
    out = q_recursive_month_series(spark, SF0001).collect()
    months = [r["month_start"] for r in out]
    assert months == sorted(months)
    for prev, cur in zip(months, months[1:]):
        nxt = (prev.year, prev.month % 12 + 1) if prev.month < 12 else (
            prev.year + 1,
            1,
        )
        assert (cur.year, cur.month) == nxt  # no month gaps
    total = sum(r["n_orders"] for r in out)
    assert total == load(spark, SF0001, "orders").count()


def test_lateral_topk_two_rows_per_region_max(spark):
    out = q_lateral_topk(spark, SF0001)
    per_region = out.groupBy("r_name").count().collect()
    assert per_region and all(r["count"] <= 2 for r in per_region)
    # within a region, counts are non-increasing
    rows = out.orderBy("r_name", F.desc("n_cust"), "n_name").collect()
    by_region: dict[str, list[int]] = {}
    for r in rows:
        by_region.setdefault(r["r_name"], []).append(r["n_cust"])
    for counts in by_region.values():
        assert counts == sorted(counts, reverse=True)
