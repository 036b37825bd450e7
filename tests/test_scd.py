from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans.scd import q_scd2_history

SF0001 = "/root/testdata/sf0.001"


def test_scd2_intervals_tile_without_overlap(spark):
    out = q_scd2_history(spark, SF0001)
    # exactly one current row per user
    cur = out.groupBy("user_id").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_cur")
    )
    assert cur.filter(F.col("n_cur") != 1).count() == 0
    # versions are 1..n per user and intervals chain exactly:
    # effective_to of version v equals effective_from of v+1
    rows = out.orderBy("user_id", "version").collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for versions in by_user.values():
        assert [r["version"] for r in versions] == list(
            range(1, len(versions) + 1)
        )
        for a, b in zip(versions, versions[1:]):
            assert a["effective_to"] == b["effective_from"]
            assert not a["is_current"]
            assert a["state"] != b["state"]  # no-op changes collapsed
        assert versions[-1]["effective_to"] is None


def test_incremental_apply_equals_full_rebuild(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.scd import (
        q_scd2_history,
        q_scd2_incremental_apply,
    )

    sf = "/root/testdata/sf0.001"
    full = q_scd2_history(spark, sf).toPandas()
    inc = q_scd2_incremental_apply(spark, sf).toPandas()
    cols = sorted(full.columns)
    full = full[cols].sort_values(by=cols, ignore_index=True)
    inc = inc[cols].sort_values(by=cols, ignore_index=True)
    assert full.equals(inc)
