from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import datetime as dt

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics49 import (
    q_attribution_time_decay,
    q_cusum_control,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans.llm14 import (
    q_embedding_clusters,
)

SF0001 = "/root/testdata/sf0.001"


def test_time_decay_credit_sums_to_purchases(spark):
    rows = q_attribution_time_decay(spark, SF0001).collect()
    total_credit = sum(r["total_credit"] for r in rows)
    # every purchase with ≥1 touch distributes exactly one unit
    # (up to the picounit floor per touch)
    attributed = (
        load(spark, SF0001, "events")
        .filter(F.col("event_type") == "purchase")
        .alias("p")
        .join(
            load(spark, SF0001, "events")
            .filter(F.col("event_type") != "purchase")
            .alias("t"),
            (F.col("t.user_id") == F.col("p.user_id"))
            & (F.col("t.ts") < F.col("p.ts"))
            & (
                F.col("t.ts")
                >= F.col("p.ts") - F.expr("INTERVAL 24 HOUR")
            ),
        )
        .select(F.col("p.event_id"))
        .distinct()
        .count()
    )
    assert attributed > 0
    assert abs(total_credit - attributed) < 1e-6 * attributed + 1e-3
    for r in rows:
        assert r["total_credit"] > 0


def test_cusum_matches_recursive_definition(spark):
    rows = sorted(q_cusum_control(spark, SF0001).collect(), key=lambda r: r["day"])
    cents = [r["cents"] for r in rows]
    n = len(cents)
    total = sum(cents)
    s = 0
    for r, x in zip(rows, cents):
        s = max(0, s + (x * n - total))
        assert r["cusum_scaled"] == s
        assert abs(r["cusum_cents"] - s / n) < 1e-9 * max(1, s / n)
    assert all(r["cusum_scaled"] >= 0 for r in rows)


def test_embedding_clusters_equal_bruteforce_components(spark):
    import numpy as np

    rows = {r["vec_id"]: r["cluster"] for r in q_embedding_clusters(spark, SF0001).collect()}
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load(spark, SF0001, "embeddings").collect()
    }
    ids = sorted(emb)
    adj = defaultdict(set)
    for i, a in enumerate(ids):
        va = emb[a]
        na = np.linalg.norm(va)
        for b in ids[i + 1 :]:
            c = float(va @ emb[b] / (na * np.linalg.norm(emb[b])))
            if round(c, 6) >= 0.35:
                adj[a].add(b)
                adj[b].add(a)
    # union-find reference
    parent = {v: v for v in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, nbrs in adj.items():
        for b in nbrs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    expected = {v: find(v) for v in ids}
    assert rows == expected
    # non-trivial structure: at least one multi-member cluster
    assert any(expected[v] != v for v in ids)
