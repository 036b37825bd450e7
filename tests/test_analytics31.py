from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics31 import (
    q_shipping_sla,
)

SF0001 = "/root/testdata/sf0.001"


def test_shipping_sla_matches_python_recompute(spark):
    li = load(spark, SF0001, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    o = load(spark, SF0001, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate", "o_orderpriority"
    )
    joined = li.join(o, "l_orderkey").collect()
    by_pri: dict[str, list[int]] = {}
    for r in joined:
        delay = (r["l_shipdate"].date() - r["o_orderdate"].date()).days
        by_pri.setdefault(r["o_orderpriority"], []).append(delay)
    got = {r["o_orderpriority"]: r for r in q_shipping_sla(spark, SF0001).collect()}
    assert set(got) == set(by_pri)
    for pri, delays in by_pri.items():
        delays.sort()
        n = len(delays)
        r = got[pri]
        assert r["n_lineitems"] == n
        assert r["n_within_sla"] == sum(1 for d in delays if d <= 30)
        assert r["max_delay_days"] == delays[-1]
        assert r["p90_delay_days"] == delays[math.ceil(0.9 * n) - 1]
        assert abs(r["sla_attainment"] - r["n_within_sla"] / n) < 1e-15
