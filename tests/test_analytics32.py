from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics32 import (
    q_duplicate_payments,
    q_reciprocal_nn,
)

SF0001 = "/root/testdata/sf0.001"


def test_duplicate_payment_pairs_satisfy_all_predicates(spark):
    rows = q_duplicate_payments(spark, SF0001).collect()
    assert rows, "expected banded duplicate candidates at sf0.001"
    orders = {
        r["o_orderkey"]: r for r in load(spark, SF0001, "orders").collect()
    }
    for r in rows:
        a, b = orders[r["key_a"]], orders[r["key_b"]]
        assert a["o_custkey"] == b["o_custkey"] == r["o_custkey"]
        assert int(a["o_totalprice"] // 10_000) == int(
            b["o_totalprice"] // 10_000
        )
        assert 0 <= r["gap_days"] <= 365
        assert r["key_a"] < r["key_b"]


def test_reciprocal_nn_is_symmetric_subset_of_knn(spark):
    out = q_reciprocal_nn(spark, SF0001).collect()
    assert out
    # recompute directed top-3 in Python over quantized cosines
    import math

    emb = {
        r["vec_id"]: [math.floor(x * 1000) for x in r["embedding"]]
        for r in load(spark, SF0001, "embeddings")
        .filter(F.col("vec_id") < 100)
        .collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / math.sqrt(
            sum(x * x for x in a) * sum(y * y for y in b)
        )

    topk = {}
    for i, vi in emb.items():
        scored = sorted(
            ((cos(vi, vj), -j) for j, vj in emb.items() if j != i),
            reverse=True,
        )[:3]
        topk[i] = {-j for _, j in scored}
    want = {
        (i, j)
        for i in emb
        for j in topk[i]
        if i < j and i in topk[j]
    }
    got = {(r["vec_a"], r["vec_b"]) for r in out}
    assert got == want
