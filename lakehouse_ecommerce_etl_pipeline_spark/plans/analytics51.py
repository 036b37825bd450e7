"""Analytics tier LI: CDC-driven incremental aggregate maintenance.

The missing link between the CDC tier (operators/cdc.py
table_changes — Delta CDF analogue) and the incremental-MV tier
(q_incremental_agg_merge, which merges *append-only* partial
aggregates): maintain a materialized per-customer aggregate through a
change feed that contains DELETES and UPDATES, by applying signed
retraction deltas — insert/update_postimage rows count +1, delete/
update_preimage rows count −1 — to the previously materialized
aggregate. ``incremental ≡ recompute`` is the oracle: the maintained
result must equal a direct aggregation of the final snapshot
(the same proof shape as q_scd2_incremental_apply).

Snapshots are synthesized deterministically from ``orders``:
yesterday = keys with o_orderkey % 3 != 0; today drops keys with
o_orderkey % 5 == 0 and bumps the price of keys with
o_orderkey % 7 == 0 by 12,345 cents — producing all three change
kinds. Money lives as integer cents throughout (SUM/COUNT are the
self-maintainable aggregates; MIN/MAX would need the base table on a
delete — documented, not silently wrong).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.operators.cdc import (
    CHANGE_COL,
    table_changes,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_BUMP_CENTS = 12345


def _snapshots(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(yesterday, today) deterministic snapshot pair over orders,
    keyed by o_orderkey, payload (o_custkey, cents)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    base = o.filter(F.col("o_orderkey") % 3 != 0)
    final = o.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "cents",
        F.col("cents")
        + F.when(F.col("o_orderkey") % 7 == 0, F.lit(_BUMP_CENTS)).otherwise(0),
    )
    return base, final


@register(
    "q_cdc_agg_maintenance",
    oracle=f"""
    WITH fin AS (
      SELECT o_custkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT)
             + CASE WHEN o_orderkey % 7 = 0 THEN {_BUMP_CENTS} ELSE 0 END
               AS cents
      FROM orders
      WHERE o_orderkey % 5 <> 0
    )
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS order_cnt,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM fin GROUP BY o_custkey
    """,
)
def q_cdc_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain a per-customer (order count, total cents) materialized
    aggregate through a CDC feed with inserts, deletes, and updates —
    WITHOUT touching the fact table again: the feed's pre/post images
    become signed deltas (+row for insert/update_postimage, −row for
    delete/update_preimage), the deltas aggregate per customer, and a
    full-outer merge adds them onto yesterday's materialized
    aggregate; customers whose count reaches zero drop out. The
    oracle recomputes the aggregate directly from the final snapshot
    — incremental ≡ recompute, the invariant every incremental-MV
    engine (Delta Live Tables, Materialize) must hold.

    100 TB: this is THE pattern that replaces an O(history) nightly
    recompute with O(changed rows) work — the CDC diff shuffles the
    two snapshots once by key (zero exchanges if snapshots are
    bucketed; in a real lakehouse the feed is *read* from the CDF, not
    diffed), delta aggregation is partial-combined to at most
    |touched customers| rows, and the merge joins aggregate-sized
    tables, never facts. SUM/COUNT/AVG are self-maintainable under
    retraction; MIN/MAX are not (a deleted minimum forces a re-read)
    — that asymmetry decides what a 100 TB MV is allowed to contain."""
    base, final = _snapshots(spark, sf_dir)
    feed = table_changes(base, final, ["o_orderkey"])

    base_agg = base.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("order_cnt"),
        F.sum("cents").cast("bigint").alias("total_cents"),
    )
    sign = F.when(
        F.col(CHANGE_COL).isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = feed.groupBy("o_custkey").agg(
        F.sum(sign).cast("bigint").alias("d_cnt"),
        F.sum(sign * F.col("cents")).cast("bigint").alias("d_cents"),
    )
    maintained = (
        base_agg.join(delta, "o_custkey", "full_outer")
        .select(
            "o_custkey",
            (
                F.coalesce("order_cnt", F.lit(0)) + F.coalesce("d_cnt", F.lit(0))
            ).alias("order_cnt"),
            (
                F.coalesce("total_cents", F.lit(0))
                + F.coalesce("d_cents", F.lit(0))
            ).alias("total_cents"),
        )
        .filter(F.col("order_cnt") > 0)
    )
    return maintained
