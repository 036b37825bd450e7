from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics47 import (
    q_decision_stump,
    q_quantile_normalize,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans.llm12 import (
    q_dedup_incremental,
)

SF0001 = "/root/testdata/sf0.001"


def test_decision_stump_matches_bruteforce(spark):
    row = q_decision_stump(spark, SF0001).collect()[0]
    pts = [
        (r["o_totalprice"], r["o_orderstatus"] == "F")
        for r in load(spark, SF0001, "orders")
        .select("o_totalprice", "o_orderstatus")
        .collect()
    ]
    xs = sorted({x for x, _ in pts})
    best = None
    for t in xs[:-1]:  # last threshold leaves an empty right side
        pos_l = sum(1 for x, p in pts if x <= t and p)
        n_l = sum(1 for x, _ in pts if x <= t)
        pos_r = sum(1 for x, p in pts if x > t and p)
        n_r = len(pts) - n_l
        score = pos_l * (n_l - pos_l) / n_l + pos_r * (n_r - pos_r) / n_r
        if best is None or (score, t) < best:
            best = (score, t)
    assert abs(row["impurity_score"] - best[0]) < 1e-9
    assert row["threshold"] == best[1]
    assert row["n_left"] + row["n_right"] == len(pts)


def test_quantile_normalize_uniform_per_group(spark):
    rows = q_quantile_normalize(spark, SF0001).collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault(r["o_orderpriority"], []).append(r["qnorm"])
    for vals in groups.values():
        assert min(vals) == 0.0
        assert max(vals) == 1.0
        assert all(0.0 <= v <= 1.0 for v in vals)
        # ranks over a total order → all qnorm values distinct
        assert len(set(vals)) == len(vals)


def test_incremental_dedup_flags_match_batch_semantics(spark):
    rows = q_dedup_incremental(spark, SF0001).collect()
    new_ids = {
        r["doc_id"]
        for r in load(spark, SF0001, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select("doc_id")
        .collect()
    }
    assert {r["doc_id"] for r in rows} == new_ids
    for r in rows:
        assert r["n_dups"] <= r["n_candidates"]
        assert r["is_dup"] == (r["n_dups"] > 0)
        if r["is_dup"]:
            assert r["first_match"] is not None
            assert r["first_match"] % 5 != 0  # matches come from the index
        else:
            assert r["first_match"] is None
