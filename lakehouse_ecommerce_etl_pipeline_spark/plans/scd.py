"""Slowly-changing-dimension (Type 2) history reconstruction.

Treats the events stream as a change feed of per-user state
(event_type = the changing attribute) and rebuilds the SCD2 version
table: one row per state interval with effective_from / effective_to
/ is_current / version, consecutive no-op changes collapsed.

Cross-engine exactness: pure window functions over exact microsecond
timestamps with a full (ts, event_id) tiebreak order — both engines
produce identical intervals.

Reference parity: the reference's MERGE upserts (glue_jobs/
orders_etl.py:84-92 whenMatchedUpdate/whenNotMatchedInsert) implement
SCD Type 1 — overwrite, no history. Type 2 is the standard lakehouse
extension its docs gesture at; here it is as one declarative plan.

100 TB: two window passes partitioned by the dimension key — state
stays bounded per key, no self-join against history. In production
the same plan runs incrementally: MERGE closes the open interval
(sets effective_to) and inserts the new current row, exactly the
reference's MERGE shape plus one UPDATE branch.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


@register(
    "q_scd2_history",
    oracle="""
    WITH dedup AS (
      SELECT user_id, ts, event_id, event_type
      FROM (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
      ) t
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id,
           event_type AS state,
           ts AS effective_from,
           LEAD(ts) OVER w AS effective_to,
           LEAD(ts) OVER w IS NULL AS is_current,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version
    FROM dedup
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_scd2_history(spark, sf_dir):
    """SCD Type-2 rebuild: collapse consecutive identical states
    (lag-compare), then derive each version's validity interval with
    lead() — effective_to of one row is effective_from of the next,
    the open row is current."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w2)
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("effective_from"),
        nxt.alias("effective_to"),
        nxt.isNull().alias("is_current"),
        F.row_number().over(w2).cast("bigint").alias("version"),
    )
