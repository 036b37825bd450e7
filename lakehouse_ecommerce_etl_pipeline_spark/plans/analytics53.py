"""Analytics tier LIII: aggregation-based deterministic dedup.

The window-function dedup (`q_dedup_by_key`, SURVEY §2 A1) is the
reference-parity form; this tier adds the plan that wins at scale
when keys are heavily duplicated: ``min_by(struct(row), struct(ord))``
is partial-aggregable, so every map task pre-reduces to one survivor
candidate per key BEFORE the exchange — shuffle volume
O(distinct keys × tasks), not O(rows), and no per-partition sort.
`operators/dedup.dedup_minby`; plan-audited: partial SortAggregate →
Exchange → final (the window form is Exchange-then-sort-everything).

Result-identical to the window form under a total order — both are
pinned to the same DuckDB ROW_NUMBER oracle, and the pytest asserts
frame-level equality between the two implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakehouse_ecommerce_etl_pipeline_spark.operators.dedup import dedup_minby
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


@register(
    "q_dedup_minby",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
    FROM (
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def q_dedup_minby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest order per customer via partial-aggregable min_by
    (see module docstring for why this beats the window form at
    100 TB duplication levels)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    return dedup_minby(o, ["o_custkey"], ["o_orderdate", "o_orderkey"])
