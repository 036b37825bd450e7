"""q_cdc_join_maintenance: incremental ≡ recompute, asserted inside
Spark (independent of the DuckDB oracle), plus coverage that the
change feeds actually contain every change kind — including keys
changed on BOTH sides, the reason the ΔA⋈ΔB term exists."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.operators.cdc import CHANGE_COL, table_changes
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics55 import (
    _line_snapshots,
    _order_snapshots,
    q_cdc_join_maintenance,
)

SF = "/root/testdata/sf0.001"


def test_incremental_equals_recompute(spark):
    _, o_final = _order_snapshots(spark, SF)
    _, l_final = _line_snapshots(spark, SF)
    direct = o_final.join(
        l_final, o_final["o_orderkey"] == l_final["l_orderkey"]
    ).select("l_orderkey", "l_linenumber", "cents", "qty")
    maintained = q_cdc_join_maintenance(spark, SF)
    assert maintained.exceptAll(direct).count() == 0
    assert direct.exceptAll(maintained).count() == 0


def test_feeds_cover_all_change_kinds_including_both_sides(spark):
    o_base, o_final = _order_snapshots(spark, SF)
    l_base, l_final = _line_snapshots(spark, SF)
    dA = table_changes(o_base, o_final, ["o_orderkey"])
    dB = table_changes(l_base, l_final, ["l_orderkey", "l_linenumber"])
    kinds_a = {r[CHANGE_COL] for r in dA.select(CHANGE_COL).distinct().collect()}
    kinds_b = {r[CHANGE_COL] for r in dB.select(CHANGE_COL).distinct().collect()}
    full = {"insert", "delete", "update_preimage", "update_postimage"}
    assert kinds_a == full and kinds_b == full
    # at least one view key touched on BOTH sides (exercises ΔA⋈ΔB)
    both = (
        dA.select("o_orderkey")
        .distinct()
        .join(
            dB.select("l_orderkey").distinct(),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert both > 0
