from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics59 import (
    _ROUNDS,
    _SEED_MOD,
    q_ab_test_exact,
    q_sssp_weighted,
)

SF0001 = "/root/testdata/sf0.001"


def test_sssp_matches_pure_python_bellman_ford(spark):
    got = {r["node"]: r["dist"] for r in q_sssp_weighted(spark, SF0001).collect()}

    pairs = (
        load(spark, SF0001, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order: dict[int, set] = {}
    for r in pairs:
        by_order.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    n_co: Counter = Counter()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                n_co[(a, b)] += 1
    adj: dict[int, list] = {}
    for (a, b), c in n_co.items():
        w = 1 + 1000 // c
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))

    seeds = [
        r["p_partkey"]
        for r in load(spark, SF0001, "part").collect()
        if r["p_partkey"] % _SEED_MOD == 0
    ]
    dist = {s: 0 for s in seeds}
    for _ in range(_ROUNDS):
        nxt = dict(dist)
        for node, d in dist.items():
            for other, w in adj.get(node, []):
                if other not in nxt or d + w < nxt[other]:
                    nxt[other] = d + w
        dist = nxt
    assert got == dist


def test_ab_test_matches_arbitrary_precision_python(spark):
    rows = {r["segment"]: r for r in q_ab_test_exact(spark, SF0001).collect()}

    orders = load(spark, SF0001, "orders")
    customer = load(spark, SF0001, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .select("c_mktsegment", "o_orderstatus")
        .collect()
    )
    n1: Counter = Counter()
    s1: Counter = Counter()
    for r in joined:
        n1[r["c_mktsegment"]] += 1
        if r["o_orderstatus"] == "F":
            s1[r["c_mktsegment"]] += 1
    n, s = sum(n1.values()), sum(s1.values())

    assert set(rows) == set(n1)
    for seg, r in rows.items():
        a_s1, a_n1 = s1[seg], n1[seg]
        a_s2, a_n2 = s - a_s1, n - a_n1
        assert (r["successes"], r["trials"]) == (a_s1, a_n1)
        assert (r["rest_successes"], r["rest_trials"]) == (a_s2, a_n2)
        diff = a_s1 * a_n2 - a_s2 * a_n1
        lhs = 10000 * n * diff * diff
        rhs = 38416 * s * (n - s) * a_n1 * a_n2
        assert r["significant"] == (lhs >= rhs)


def test_ab_test_decimal_headroom_synthetic(spark):
    """The DECIMAL(38,0) products must not overflow (Spark nulls on
    overflow) at cell sizes past any tested sf: verify the verdict
    survives million-trial synthetic groups."""
    df = spark.createDataFrame(
        [("A", 400_000, 1_000_000), ("B", 401_500, 1_000_000)],
        "segment string, s1 long, n1 long",
    )
    from pyspark.sql import functions as F

    tot = df.agg(F.sum("s1").alias("s"), F.sum("n1").alias("n"))
    dec = "decimal(38,0)"
    x = df.crossJoin(F.broadcast(tot)).select(
        "segment",
        F.col("s1").cast(dec).alias("s1"),
        F.col("n1").cast(dec).alias("n1"),
        (F.col("s") - F.col("s1")).cast(dec).alias("s2"),
        (F.col("n") - F.col("n1")).cast(dec).alias("n2"),
        F.col("s").cast(dec).alias("s"),
        F.col("n").cast(dec).alias("n"),
    )
    diff = F.col("s1") * F.col("n2") - F.col("s2") * F.col("n1")
    lhs = F.lit(10000).cast(dec) * F.col("n") * diff * diff
    rhs = (
        F.lit(38416).cast(dec)
        * F.col("s")
        * (F.col("n") - F.col("s"))
        * F.col("n1")
        * F.col("n2")
    )
    out = {r["segment"]: r["sig"] for r in x.select("segment", (lhs >= rhs).alias("sig")).collect()}
    # python ints as the arbitrary-precision witness
    s1a, n1a, s1b, n1b = 400_000, 1_000_000, 401_500, 1_000_000
    n, s = n1a + n1b, s1a + s1b
    for seg, (a_s1, a_n1) in {"A": (s1a, n1a), "B": (s1b, n1b)}.items():
        a_s2, a_n2 = s - a_s1, n - a_n1
        d = a_s1 * a_n2 - a_s2 * a_n1
        expect = 10000 * n * d * d >= 38416 * s * (n - s) * a_n1 * a_n2
        assert out[seg] is not None and out[seg] == expect
