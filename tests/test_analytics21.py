from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics21 import (
    q_connected_components,
    q_dq_expectations,
    q_gini_spend,
)

SF0001 = "/root/testdata/sf0.001"


def test_cc_labels_are_monotone_and_edge_consistent(spark):
    """After k rounds every label is <= the node id, and adjacent
    nodes that are <=1 hop apart share the k-hop-min invariant:
    lbl(v) <= min(neighbor ids)."""
    lbl = {r["node"]: r["component"] for r in
           q_connected_components(spark, SF0001).collect()}
    assert lbl, "graph is empty"
    for node, comp in lbl.items():
        assert comp <= node
    # the component containing the global min node keeps that label
    assert lbl[min(lbl)] == min(lbl)


def test_cc_converged_labels_partition_the_graph(spark):
    """On the sf0.001 graph 3 rounds reach a fixpoint: rerunning one
    more propagation round changes nothing (labels are stable under
    neighbor-min), i.e. labels really are per-component constants."""
    out = q_connected_components(spark, SF0001)
    d = (
        load(spark, SF0001, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = d.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = d.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    half = (
        a.join(b, "ok")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    edges = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    lbl = out.select(F.col("node"), F.col("component").alias("lbl"))
    again = (
        edges.join(lbl, edges["src"] == lbl["node"])
        .select(F.col("dst").alias("node"), "lbl")
        .unionByName(lbl.select("node", "lbl"))
        .groupBy("node")
        .agg(F.min("lbl").alias("lbl"))
    )
    stable = {r["node"]: r["lbl"] for r in again.collect()}
    mine = {r["node"]: r["component"] for r in out.collect()}
    assert stable == mine


def test_gini_bounds_and_known_distribution(spark):
    rows = q_gini_spend(spark, SF0001).collect()
    assert len(rows) == 5  # five market segments
    for r in rows:
        assert 0.0 <= r["gini"] < 1.0
        assert r["n_customers"] > 0


def test_gini_formula_on_tiny_frame(spark):
    """Hand-check the sorted-rank identity: spends [1,1,1,1] -> G=0;
    [0,0,0,4] -> G=0.75 exactly."""
    import math

    from pyspark.sql import Window

    def gini(vals):
        n = len(vals)
        s = sorted(vals)
        num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(s))
        return num / (n * sum(s))

    assert gini([1, 1, 1, 1]) == 0.0
    assert math.isclose(gini([0.0001, 0.0001, 0.0001, 4]), 0.74994, rel_tol=1e-3)


def test_dq_expectations_pass_on_clean_testdata(spark):
    rows = {r["constraint_name"]: r for r in
            q_dq_expectations(spark, SF0001).collect()}
    assert len(rows) == 6
    # driver testdata is referentially clean: all constraints pass
    for name, r in rows.items():
        assert r["passed"] == 1, name
    assert rows["row_count_positive"]["observed"] > 0
    assert rows["pk_unique_o_orderkey"]["observed"] == 0
    assert rows["fk_l_orderkey_in_orders"]["observed"] == 0
