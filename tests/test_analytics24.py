from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics24 import (
    q_degree_distribution,
    q_interorder_gap,
    q_nullsafe_join,
    q_oov_rate,
    q_weighted_median,
)

SF0001 = "/root/testdata/sf0.001"


def test_weighted_median_is_the_crossing_value(spark):
    """Recompute per segment in Python: sort (acctbal, custkey),
    accumulate weights, take the first value with 2*cum >= tot."""
    rows = load(spark, SF0001, "customer").collect()
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r["c_mktsegment"], []).append(
            (r["c_acctbal"], r["c_custkey"], r["c_nationkey"] + 1)
        )
    want = {}
    for seg, xs in by_seg.items():
        xs.sort()
        tot = sum(w for _, _, w in xs)
        cum = 0
        for v, _, w in xs:
            cum += w
            if 2 * cum >= tot:
                want[seg] = v
                break
    got = {
        r["c_mktsegment"]: r["weighted_median"]
        for r in q_weighted_median(spark, SF0001).collect()
    }
    assert got == want


def test_oov_rate_bounds_and_vocab_coverage(spark):
    out = q_oov_rate(spark, SF0001).collect()
    assert len(out) == load(spark, SF0001, "documents").count()
    for r in out:
        assert 0 <= r["n_oov"] <= r["n_words"]
        assert abs(r["oov_rate"] - r["n_oov"] / r["n_words"]) < 1e-12
    # with a 50-word vocab over a ~60-word synthetic vocabulary corpus,
    # some docs must contain at least one in-vocab token
    assert any(r["n_oov"] < r["n_words"] for r in out)


def test_degree_distribution_conserves_nodes_and_endpoints(spark):
    out = q_degree_distribution(spark, SF0001).collect()
    n_nodes = sum(r["n_nodes"] for r in out)
    endpoint_total = sum(r["degree"] * r["n_nodes"] for r in out)
    # every part that appears in some order is a node
    parts_in_orders = (
        load(spark, SF0001, "lineitem").select("l_partkey").distinct().count()
    )
    # isolated parts (only ever alone in their orders) carry no edge
    assert 0 < n_nodes <= parts_in_orders
    # sum of degrees = 2 * |undirected edges|
    assert endpoint_total % 2 == 0


def test_interorder_gap_nonnegative_and_counts_match(spark):
    out = q_interorder_gap(spark, SF0001)
    assert out.filter(F.col("max_gap_days") < 0).count() == 0
    assert out.filter(F.col("total_gap_days") < 0).count() == 0
    # a customer with n orders has n-1 gaps
    per_cust = (
        load(spark, SF0001, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )
    j = out.join(per_cust, "o_custkey")
    bad = j.filter(F.col("n_gaps") != F.col("n_orders") - 1)
    assert bad.count() == 0
    assert out.count() == per_cust.count()


def test_nullsafe_join_keeps_null_keys(spark):
    out = q_nullsafe_join(spark, SF0001)
    orders = load(spark, SF0001, "orders")
    assert out.count() == orders.count()
    n_urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    null_rows = out.filter(F.col("pri").isNull())
    assert null_rows.count() == n_urgent
    # every nulled row joined to the null group's count
    assert null_rows.filter(F.col("n_orders") != n_urgent).count() == 0
