"""CDC + profiling queries: change-data-feed diff between two
deterministic snapshot views of the orders table (operators/cdc.py)
and the ANALYZE-TABLE statistics pass (operators/profile.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.operators.cdc import table_changes
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

# v1 drops every 7th order (those become inserts); v2 bumps the price
# of every 5th (those become update pre/post pairs); orders only in v1
# (none here) would be deletes. Doubles multiply identically (IEEE
# binary64) so the *1.1 postimage hashes identically on both engines.
_V1 = "SELECT * FROM orders WHERE o_orderkey % 7 <> 0"
_V2 = """
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 1.1
                ELSE o_totalprice END AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders
"""


@register(
    "q_table_changes",
    oracle=f"""
    WITH v1 AS ({_V1}), v2 AS ({_V2}),
    j AS (
      SELECT COALESCE(v2.o_orderkey, v1.o_orderkey) AS k,
             v1.o_orderkey IS NOT NULL AS in_old,
             v2.o_orderkey IS NOT NULL AS in_new,
             v1.o_custkey AS old_custkey, v2.o_custkey AS new_custkey,
             v1.o_orderstatus AS old_status, v2.o_orderstatus AS new_status,
             v1.o_totalprice AS old_price, v2.o_totalprice AS new_price,
             v1.o_orderdate AS old_date, v2.o_orderdate AS new_date,
             v1.o_orderpriority AS old_prio, v2.o_orderpriority AS new_prio
      FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    ),
    diff AS (
      SELECT *,
             in_old AND in_new AND (
               (old_custkey  IS DISTINCT FROM new_custkey) OR
               (old_status   IS DISTINCT FROM new_status) OR
               (old_price    IS DISTINCT FROM new_price) OR
               (old_date     IS DISTINCT FROM new_date) OR
               (old_prio     IS DISTINCT FROM new_prio)
             ) AS is_update
      FROM j
    )
    SELECT k AS o_orderkey, new_custkey AS o_custkey,
           new_status AS o_orderstatus, new_price AS o_totalprice,
           new_date AS o_orderdate, new_prio AS o_orderpriority,
           'insert' AS _change_type
    FROM diff WHERE in_new AND NOT in_old
    UNION ALL
    SELECT k, old_custkey, old_status, old_price, old_date, old_prio,
           'delete'
    FROM diff WHERE in_old AND NOT in_new
    UNION ALL
    SELECT k, old_custkey, old_status, old_price, old_date, old_prio,
           'update_preimage'
    FROM diff WHERE is_update
    UNION ALL
    SELECT k, new_custkey, new_status, new_price, new_date, new_prio,
           'update_postimage'
    FROM diff WHERE is_update
    """,
)
def q_table_changes(spark, sf_dir):
    """Change-data-feed diff (Delta ``table_changes`` analogue): the
    row-level inserts, deletes, and update pre/post images that turn
    snapshot v1 into snapshot v2 — the primitive that lets downstream
    consumers process increments instead of re-scanning the table.
    One full-outer join keyed on the PK; null-safe payload compare.
    """
    orders = load(spark, sf_dir, "orders")
    v1 = orders.filter(F.col("o_orderkey") % 7 != 0)
    v2 = orders.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") * 1.1
        ).otherwise(F.col("o_totalprice")),
    )
    return table_changes(v1, v2, ["o_orderkey"])


def _profile_branch_sql(col: str, num_expr: str | None, is_str: bool) -> str:
    num = num_expr or "NULL"
    mn = f"MIN({num})" if num_expr else "CAST(NULL AS DOUBLE)"
    mx = f"MAX({num})" if num_expr else "CAST(NULL AS DOUBLE)"
    ms = f"MIN({col})" if is_str else "CAST(NULL AS VARCHAR)"
    xs = f"MAX({col})" if is_str else "CAST(NULL AS VARCHAR)"
    return f"""
      SELECT '{col}' AS column_name,
             COUNT(*) AS n_rows,
             COUNT(*) - COUNT({col}) AS n_nulls,
             COUNT(DISTINCT {col}) AS n_distinct,
             CAST({mn} AS DOUBLE) AS min_num, CAST({mx} AS DOUBLE) AS max_num,
             {ms} AS min_str, {xs} AS max_str
      FROM orders"""


_PROFILE_SQL = " UNION ALL ".join(
    [
        _profile_branch_sql("o_orderkey", "CAST(o_orderkey AS DOUBLE)", False),
        _profile_branch_sql("o_custkey", "CAST(o_custkey AS DOUBLE)", False),
        _profile_branch_sql("o_orderstatus", None, True),
        _profile_branch_sql("o_totalprice", "CAST(o_totalprice AS DOUBLE)", False),
        _profile_branch_sql("o_orderdate", "CAST(epoch_us(o_orderdate) AS DOUBLE)", False),
        _profile_branch_sql("o_orderpriority", None, True),
    ]
)


@register("q_profile_table", oracle=_PROFILE_SQL)
def q_profile_table(spark, sf_dir):
    """ANALYZE-TABLE statistics pass (operators/profile.py): one row
    per column with null/distinct counts and type-bucketed min/max
    (numerics+timestamps as doubles/micro-epochs, strings as
    strings). Long layout, one single-column pruned scan per branch —
    avoids the wide-aggregate codegen cliff."""
    from lakehouse_ecommerce_etl_pipeline_spark.operators.profile import (
        profile_table,
    )

    return profile_table(load(spark, sf_dir, "orders"))
