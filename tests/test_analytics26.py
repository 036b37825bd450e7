from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics26 import (
    q_gdpr_erasure_audit,
    q_k_anonymity,
    q_retention_sweep,
)

SF0001 = "/root/testdata/sf0.001"


def test_k_anonymity_covers_every_customer_once(spark):
    out = q_k_anonymity(spark, SF0001)
    total = out.agg(F.sum("group_size")).collect()[0][0]
    assert total == load(spark, SF0001, "customer").count()
    # l-diversity (distinct custkeys) can never exceed group size,
    # and with custkey as the sensitive column they must be equal
    bad = out.filter(F.col("l_diversity") != F.col("group_size"))
    assert bad.count() == 0
    assert out.filter(F.col("below_k") & (F.col("group_size") >= 5)).count() == 0


def test_retention_sweep_only_expired_rows(spark):
    out = q_retention_sweep(spark, SF0001).collect()
    import datetime as dt

    cutoff = dt.datetime(2024, 1, 15)
    for r in out:
        assert r["newest"] < cutoff
        assert r["oldest"] <= r["newest"]
    n = sum(r["n_expired"] for r in out)
    want = (
        load(spark, SF0001, "events")
        .filter(F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .count()
    )
    assert n == want


def test_gdpr_audit_counts_match_direct_filters(spark):
    rows = {r["table_name"]: r for r in q_gdpr_erasure_audit(spark, SF0001).collect()}
    assert set(rows) == {"events", "orders", "customer"}
    ev = load(spark, SF0001, "events").filter(F.col("user_id") % 97 == 0)
    # user_id domain is small; only keys that are real customers count
    cust_keys = {
        r["c_custkey"]
        for r in load(spark, SF0001, "customer")
        .filter(F.col("c_custkey") % 97 == 0)
        .collect()
    }
    n_ev = ev.filter(F.col("user_id").isin(list(cust_keys))).count()
    assert rows["events"]["n_rows"] == n_ev
    n_cust = len(cust_keys)
    assert rows["customer"]["n_rows"] == n_cust
    assert rows["customer"]["n_subjects"] == n_cust
