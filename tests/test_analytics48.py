from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import (
    load,
    order_part_edges,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics48 import (
    q_clustering_coefficient,
    q_null_skew_join,
    q_systematic_sample,
    q_two_hop_neighbors,
)

SF0001 = "/root/testdata/sf0.001"


def _adjacency(spark):
    adj = defaultdict(set)
    for e in order_part_edges(spark, SF0001).collect():
        adj[e["src"]].add(e["dst"])
        adj[e["dst"]].add(e["src"])
    return adj


def test_systematic_sample_positions(spark):
    got = sorted(
        r["o_orderkey"] for r in q_systematic_sample(spark, SF0001).collect()
    )
    keys = sorted(
        r["o_orderkey"]
        for r in load(spark, SF0001, "orders").select("o_orderkey").collect()
    )
    assert got == keys[::97]


def test_null_skew_join_equals_plain_left_join(spark):
    routed = q_null_skew_join(spark, SF0001)
    o = load(spark, SF0001, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 10 == 0, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("cust_fk"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    plain = o.join(
        load(spark, SF0001, "customer").select("c_custkey", "c_mktsegment"),
        F.col("cust_fk") == F.col("c_custkey"),
        "left",
    ).select("o_orderkey", "cust_fk", "c_mktsegment", "cents")
    assert routed.exceptAll(plain).count() == 0
    assert plain.exceptAll(routed).count() == 0
    # the routed branch really carries the null keys
    assert routed.filter(F.col("cust_fk").isNull()).count() > 0


def test_clustering_coefficient_matches_pure_python(spark):
    adj = _adjacency(spark)
    rows = {r["node"]: r for r in q_clustering_coefficient(spark, SF0001).collect()}
    assert set(rows) == set(adj)
    for v, nbrs in adj.items():
        tri = sum(
            1
            for a in nbrs
            for b in nbrs
            if a < b and b in adj[a]
        )
        deg = len(nbrs)
        expected = 2 * tri / (deg * (deg - 1)) if deg >= 2 else 0.0
        assert rows[v]["degree"] == deg
        assert rows[v]["n_triangles"] == tri
        assert abs(rows[v]["clustering"] - expected) < 1e-12
        assert 0.0 <= rows[v]["clustering"] <= 1.0


def test_two_hop_matches_pure_python(spark):
    adj = _adjacency(spark)
    rows = {r["node"]: r for r in q_two_hop_neighbors(spark, SF0001).collect()}
    assert set(rows) == set(adj)
    for v, nbrs in adj.items():
        two_hop = set()
        for n in nbrs:
            two_hop |= adj[n]
        two_hop -= nbrs
        two_hop.discard(v)
        assert rows[v]["n_two_hop"] == len(two_hop)
        assert rows[v]["degree"] == len(nbrs)
