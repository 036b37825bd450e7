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


# ------------------------------------------ incremental SCD2 apply

_CUT = "2024-01-15 00:00:00"


def _scd2_runs(df, version_offset_col=None):
    """Lag-collapse + validity intervals over an event set (the
    q_scd2_history kernel, reusable for partial replays)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = df.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(
        F.col("prev_type").isNull()
        | (F.col("event_type") != F.col("prev_type"))
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


@register(
    "q_scd2_incremental_apply",
    oracle=f"""
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
def q_scd2_incremental_apply(spark, sf_dir):
    """Incremental SCD2 maintenance: the dimension built from events
    BEFORE the cutoff is UPDATED with the post-cutoff batch — open
    intervals close when the batch changes their state, new versions
    append with continuous version numbers, untouched users pass
    through — and the result must equal the full-history rebuild,
    which is exactly what the oracle computes (incremental ≡
    recompute, the q_incremental_agg_merge property lifted to
    interval semantics).

    Mechanics: each affected user's open row is replayed as a seed
    pseudo-event (event_id −1 sorts before every real event at the
    same timestamp) ahead of their batch events; the lag-collapse
    kernel then merges the boundary (a batch run continuing the open
    state folds into it, preserving effective_from), and the replayed
    rows take versions offset by the user's closed-version count.

    100 TB: the replay touches ONLY users present in the batch — the
    closed history and untouched users are passthrough unions, so
    incremental cost scales with batch activity, not dimension size.
    On Delta this lands as MERGE (close open rows) + append, the
    reference's own MERGE shape plus one UPDATE branch."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    cut = F.lit(_CUT).cast("timestamp")
    pre = ev.filter(F.col("ts") < cut)
    post = ev.filter(F.col("ts") >= cut)

    dim0 = _scd2_runs(pre)
    affected = post.select("user_id").distinct()

    closed_aff = dim0.join(affected, "user_id", "leftsemi").filter(
        ~F.col("is_current")
    )
    open_aff = dim0.join(affected, "user_id", "leftsemi").filter(
        F.col("is_current")
    )
    untouched = dim0.join(affected, "user_id", "leftanti")

    seed = open_aff.select(
        "user_id",
        F.col("effective_from").alias("ts"),
        F.lit(-1).cast("long").alias("event_id"),
        F.col("state").alias("event_type"),
    )
    replay = _scd2_runs(seed.unionByName(post))
    offset = open_aff.select(
        "user_id", (F.col("version") - 1).alias("v_off")
    )
    replay = (
        replay.join(offset, "user_id", "left")
        .withColumn(
            "version",
            (F.col("version") + F.coalesce(F.col("v_off"), F.lit(0))).cast(
                "bigint"
            ),
        )
        .drop("v_off")
    )
    return untouched.unionByName(closed_aff).unionByName(replay)
