from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics50 import (
    q_interval_union_length,
    q_nearest_view_join,
    q_tree_rollup,
)

SF0001 = "/root/testdata/sf0.001"


def test_tree_rollup_matches_pure_python(spark):
    rows = {r["p_partkey"]: r for r in q_tree_rollup(spark, SF0001).collect()}
    parts = {
        r["p_partkey"]: round(r["p_retailprice"] * 100)
        for r in load(spark, SF0001, "part").collect()
    }
    size = defaultdict(int)
    cents = defaultdict(int)
    for p, c in parts.items():
        node = p
        while True:
            size[node] += 1
            cents[node] += c
            if node <= 1:
                break
            node //= 2
    assert set(rows) == set(size)
    for k, r in rows.items():
        assert r["subtree_size"] == size[k]
        assert r["subtree_cents"] == cents[k]
    # key 0 is its own single-node tree; root 1 aggregates the rest
    assert rows[0]["subtree_size"] == 1
    assert rows[1]["subtree_size"] == len(parts) - 1


def test_interval_union_matches_pure_python(spark):
    rows = {r["user_id"]: r for r in q_interval_union_length(spark, SF0001).collect()}
    by_user = defaultdict(list)
    for e in load(spark, SF0001, "events").select("user_id", "ts").collect():
        s = int(e["ts"].timestamp())
        by_user[e["user_id"]].append((s, s + 1800))
    for u, ivs in by_user.items():
        ivs.sort()
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        covered = sum(e - s for s, e in merged)
        assert rows[u]["n_islands"] == len(merged)
        assert rows[u]["covered_seconds"] == covered
        # union is bounded by the naive sum and by one max-span
        assert covered <= 1800 * len(ivs)


def test_nearest_view_is_truly_nearest(spark):
    rows = {r["event_id"]: r for r in q_nearest_view_join(spark, SF0001).collect()}
    ev = load(spark, SF0001, "events").select(
        "user_id", "event_id", "ts", "event_type"
    ).collect()
    views = defaultdict(list)
    for e in ev:
        if e["event_type"] == "view":
            views[e["user_id"]].append((int(e["ts"].timestamp()), e["event_id"]))
    purchases = [e for e in ev if e["event_type"] == "purchase"]
    assert {e["event_id"] for e in purchases} == set(rows)
    for p in purchases:
        r = rows[p["event_id"]]
        vs = views.get(p["user_id"], [])
        if not vs:
            assert r["nearest_view_id"] is None
            continue
        pt = int(p["ts"].timestamp())
        best = min(abs(pt - t) for t, _ in vs)
        assert r["gap_seconds"] == best
