from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics34 import (
    q_price_dispersion,
    q_top_movers_wow,
)

SF0001 = "/root/testdata/sf0.001"


def test_price_dispersion_invariants(spark):
    rows = q_price_dispersion(spark, SF0001).collect()
    assert rows
    for r in rows:
        assert r["n_lines"] >= 5
        assert 0 < r["min_unit_price"] <= r["max_unit_price"]
        assert abs(
            r["spread_ratio"] - r["max_unit_price"] / r["min_unit_price"]
        ) < 1e-15
        assert r["spread_ratio"] >= 1.0


def test_top_movers_are_consecutive_weeks_and_sorted(spark):
    rows = q_top_movers_wow(spark, SF0001).collect()
    assert 0 < len(rows) <= 20
    deltas = [abs(r["delta"]) for r in rows]
    assert all(a >= b for a, b in zip(deltas, deltas[1:]))
    for r in rows:
        assert abs(r["delta"] - (r["revenue"] - r["prev_revenue"])) < 1e-9
        # consecutive calendar weeks only
        assert (r["week"].date() - r["week"].date()).days == 0  # sanity


def test_supplier_hhi_bounds(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics34 import (
        q_supplier_hhi,
    )

    rows = q_supplier_hhi(spark, SF0001).collect()
    assert rows
    for r in rows:
        # HHI in (1/n, 1]; floor-scaling can undershoot by <= n*1e-12
        assert 1 / r["n_suppliers"] - 1e-9 <= r["hhi"] <= 1.0 + 1e-12
        assert 0 < r["top_share"] <= 1.0
        assert r["hhi"] <= r["top_share"] + 1.0  # trivial sanity
        # top share alone contributes at least top_share^2
        assert r["hhi"] >= r["top_share"] ** 2 - 1e-9
