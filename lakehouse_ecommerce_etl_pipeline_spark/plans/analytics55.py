"""Analytics tier LV: CDC-driven incremental JOIN-view maintenance.

q_cdc_agg_maintenance (analytics51) maintains an AGGREGATE through a
change feed; this tier maintains a materialized JOIN — the other view
class every incremental-MV engine must support. The delta algebra is
the textbook one (DBSP / differential dataflow, signed bags):

    ΔV  =  ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

with each delta row signed (+1 insert/update_postimage, −1
delete/update_preimage) and join-output signs MULTIPLYING, so the
cross-delta double counts cancel exactly. ``incremental ≡ recompute``
is the oracle: the maintained view must equal the direct join of the
final snapshots.

Snapshots are synthesized deterministically from orders (key
o_orderkey, payload integer cents) and lineitem (key (l_orderkey,
l_linenumber), payload integer qty), each feed containing inserts,
deletes, AND updates — including keys changed on BOTH sides at once,
the case the ΔA⋈ΔB term exists for.
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
_BUMP_QTY = 7

def _sign():
    return F.when(
        F.col(CHANGE_COL).isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))


def _order_snapshots(spark, sf_dir) -> tuple[DataFrame, DataFrame]:
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    base = o.filter(F.col("o_orderkey") % 3 != 0)
    final = o.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "cents",
        F.col("cents")
        + F.when(F.col("o_orderkey") % 7 == 0, F.lit(_BUMP_CENTS)).otherwise(0),
    )
    return base, final


def _line_snapshots(spark, sf_dir) -> tuple[DataFrame, DataFrame]:
    # the raw table deliberately carries duplicate (orderkey,
    # linenumber) pairs (TESTDATA dirtiness); snapshots MERGE-key
    # uniqueness is restored first (max qty per key — deterministic)
    li = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.max(F.round("l_quantity").cast("bigint")).alias("qty"))
    )
    k = F.col("l_orderkey") + F.col("l_linenumber")
    base = li.filter(k % 3 != 1)
    final = li.filter(k % 5 != 1).withColumn(
        "qty",
        F.col("qty") + F.when(k % 7 == 1, F.lit(_BUMP_QTY)).otherwise(0),
    )
    return base, final


@register(
    "q_cdc_join_maintenance",
    oracle=f"""
    WITH o_fin AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT)
             + CASE WHEN o_orderkey % 7 = 0 THEN {_BUMP_CENTS} ELSE 0 END
               AS cents
      FROM orders WHERE o_orderkey % 5 <> 0
    ),
    l_dedup AS (
      SELECT l_orderkey, l_linenumber,
             MAX(CAST(ROUND(l_quantity) AS BIGINT)) AS qty0
      FROM lineitem GROUP BY l_orderkey, l_linenumber
    ),
    l_fin AS (
      SELECT l_orderkey, l_linenumber,
             qty0 + CASE WHEN (l_orderkey + l_linenumber) % 7 = 1
                    THEN {_BUMP_QTY} ELSE 0 END AS qty
      FROM l_dedup WHERE (l_orderkey + l_linenumber) % 5 <> 1
    )
    SELECT l.l_orderkey, l.l_linenumber, o.cents, l.qty
    FROM o_fin o JOIN l_fin l ON o.o_orderkey = l.l_orderkey
    """,
)
def q_cdc_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain the materialized join V = orders ⋈ lineitem (view key
    (l_orderkey, l_linenumber)) through change feeds on BOTH inputs
    without re-joining the full tables: the three delta joins above
    produce signed view changes; summing signs at (key, payload)
    grain cancels the cross-terms exactly (a key updated on both
    sides nets to one −old_pair and one +new_pair row); the surviving
    ΔV then MERGEs onto V_old by view key — net multiplicity 1 keeps
    the row, 0 keeps it with the +1 row's payload (update), −1 drops
    it. Oracle: direct join of the final snapshots — incremental ≡
    recompute.

    100 TB: the three delta joins are |Δ|-sized on at least one side
    (broadcast the delta against the bucketed base; ΔA⋈ΔB is
    delta×delta — tiny); the (key, payload) cancellation groupBy is
    Δ-sized; the closing merge is the only view-sized operation and
    is exactly a keyed MERGE — zero-exchange when V is bucketed by
    view key. The full A×B join never re-executes; that is the entire
    point of maintaining the view."""
    o_base, o_final = _order_snapshots(spark, sf_dir)
    l_base, l_final = _line_snapshots(spark, sf_dir)

    dA = table_changes(o_base, o_final, ["o_orderkey"]).withColumn("sa", _sign())
    dB = table_changes(l_base, l_final, ["l_orderkey", "l_linenumber"]).withColumn(
        "sb", _sign()
    )

    v_old = o_base.join(l_base, o_base["o_orderkey"] == l_base["l_orderkey"]).select(
        "l_orderkey", "l_linenumber", "cents", "qty"
    )

    cols = ["l_orderkey", "l_linenumber", "cents", "qty"]
    d1 = (
        dA.join(l_base, dA["o_orderkey"] == l_base["l_orderkey"])
        .select(*cols, F.col("sa").alias("m"))
    )
    d2 = (
        o_base.join(dB, o_base["o_orderkey"] == dB["l_orderkey"])
        .select(*cols, F.col("sb").alias("m"))
    )
    d3 = (
        dA.join(dB, dA["o_orderkey"] == dB["l_orderkey"])
        .select(*cols, (F.col("sa") * F.col("sb")).alias("m"))
    )
    # (key, payload)-grain cancellation: cross-terms net to zero, so
    # each touched view key keeps at most one +1 and one −1 row
    dv = (
        d1.unionByName(d2)
        .unionByName(d3)
        .groupBy(*cols)
        .agg(F.sum("m").alias("m"))
        .filter(F.col("m") != 0)
    )
    # per-key net + the payload carried by the +1 row (unique post-
    # cancellation, so max_by is deterministic)
    dnet = dv.groupBy("l_orderkey", "l_linenumber").agg(
        F.sum("m").alias("net"),
        F.max(F.when(F.col("m") > 0, F.struct("cents", "qty"))).alias("pos"),
    )
    merged = v_old.join(dnet, ["l_orderkey", "l_linenumber"], "full_outer")
    old_present = F.col("cents").isNotNull()
    mult = F.when(old_present, F.lit(1)).otherwise(F.lit(0)) + F.coalesce(
        "net", F.lit(0)
    )
    return merged.filter(mult == 1).select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.col("pos.cents"), F.col("cents")).alias("cents"),
        F.coalesce(F.col("pos.qty"), F.col("qty")).alias("qty"),
    )
