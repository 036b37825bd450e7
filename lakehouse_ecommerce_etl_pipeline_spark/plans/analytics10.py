"""Analytics tier X: inverted index, Pareto frontier, ordered funnel,
and mergeable HLL sketches.

Cross-engine exactness: posting lists are sorted-then-joined integer
strings; frontier coordinates are DECIMAL-exact sums cast to double
(comparisons on identical doubles are exact); funnel stage tests
compare exact microsecond timestamps. The HLL query is rows-only by
design — DataSketches HLL is Spark-specific — with a tolerance pytest
instead.

Reference parity: the reference's analytics zone serves ad-hoc Athena
SQL (README.md:30); these are the retrieval/product-analytics shapes
that zone exists for, none expressible in its Glue job surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.operators.aggregates import (
    dsum,
    sql_dsum,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


@register(
    "q_inverted_index",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    )
    SELECT token,
           COUNT(*) AS n_postings,
           COUNT(DISTINCT doc_id) AS n_docs,
           array_to_string(list(DISTINCT doc_id ORDER BY doc_id), ',')
             AS postings
    FROM toks
    WHERE length(token) >= 3
    GROUP BY token
    HAVING COUNT(DISTINCT doc_id) >= 5
    ORDER BY token
    """,
)
def q_inverted_index(spark, sf_dir):
    """Inverted index (token -> sorted posting list of doc ids) for
    tokens appearing in >= 5 documents — the retrieval-side companion
    to the tf-idf salience query (plans/llm2.py).

    100 TB: explode is narrow; the single shuffle keys on token.
    Token frequency is Zipfian — the head token's posting list is the
    skew hazard, so production indexes shard hot postings
    (token, shard) with a size cap, exactly like the LSH bucket cap
    (llm/lsh.py); collect_set bounds memory per (token) group here.
    Postings serialize sorted so output is deterministic."""
    toks = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.length("token") >= 3)
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_postings"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.array_join(F.array_sort(F.collect_set("doc_id")), ",").alias(
                "postings"
            ),
        )
        .filter(F.col("n_docs") >= 5)
        .orderBy("token")
    )


@register(
    "q_pareto_frontier",
    oracle=f"""
    WITH s AS (
      SELECT l_suppkey,
             {sql_dsum("l_extendedprice", "revenue")},
             {sql_dsum("l_quantity", "quantity")}
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT a.l_suppkey, a.revenue, a.quantity
    FROM s a
    WHERE NOT EXISTS (
      SELECT 1 FROM s b
      WHERE b.revenue >= a.revenue AND b.quantity >= a.quantity
        AND (b.revenue > a.revenue OR b.quantity > a.quantity)
    )
    ORDER BY a.l_suppkey
    """,
)
def q_pareto_frontier(spark, sf_dir):
    """Pareto frontier (skyline) of suppliers over (revenue, quantity):
    keep the suppliers no other supplier dominates in both measures.
    Dominance is a non-equi anti-join of the aggregate against itself.

    100 TB: the frontier runs on the AGGREGATED table (O(suppliers),
    not O(lineitems)) — always reduce first. The self-anti-join is a
    BroadcastNestedLoopJoin with the broadcast side being that same
    small aggregate; for frontiers over large point sets, pre-filter
    with a grid: only points whose cell is not strictly dominated by
    another non-empty cell can survive, which prunes quadratically."""
    s = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(dsum("l_extendedprice", "revenue"), dsum("l_quantity", "quantity"))
    )
    b = s.select(
        F.col("revenue").alias("rev_b"), F.col("quantity").alias("qty_b")
    )
    dominates = (
        (F.col("rev_b") >= F.col("revenue"))
        & (F.col("qty_b") >= F.col("quantity"))
        & ((F.col("rev_b") > F.col("revenue")) | (F.col("qty_b") > F.col("quantity")))
    )
    return (
        s.join(F.broadcast(b), dominates, "left_anti")
        .select("l_suppkey", "revenue", "quantity")
        .orderBy("l_suppkey")
    )


@register(
    "q_funnel_ordered",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(t_view) AS n_view,
           COUNT(CASE WHEN t_click > t_view THEN 1 END) AS n_view_click,
           COUNT(CASE WHEN t_click > t_view AND t_purchase > t_click
                      THEN 1 END) AS n_full_funnel
    FROM stages
    """,
)
def q_funnel_ordered(spark, sf_dir):
    """Ordered conversion funnel view -> click -> purchase: a user
    converts a stage only if their first click follows their first
    view, and first purchase follows that click (timestamp order, not
    mere presence).

    100 TB: one conditional-MIN aggregation per user (map-side
    combinable, single shuffle on user_id) and a tiny global rollup —
    the funnel never materializes per-event state. NULL-safe: a
    missing stage leaves the comparison NULL, which COUNT(CASE)
    ignores on both engines."""
    stages = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
                "t_view"
            ),
            F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
                "t_click"
            ),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("t_purchase"),
        )
    )
    ordered2 = F.col("t_click") > F.col("t_view")
    ordered3 = ordered2 & (F.col("t_purchase") > F.col("t_click"))
    return stages.agg(
        F.count("t_view").alias("n_view"),
        F.count(F.when(ordered2, F.lit(1))).alias("n_view_click"),
        F.count(F.when(ordered3, F.lit(1))).alias("n_full_funnel"),
    )


@register(
    "q_hll_mergeable",
    oracle="""
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS within_tolerance
    FROM events
    """,
)
def q_hll_mergeable(spark, sf_dir):
    """Mergeable distinct-count sketches: build one DataSketches HLL
    sketch of user_id PER event_type (hll_sketch_agg), then union the
    five sketches (hll_union_agg) and estimate global distinct users.

    100 TB: this is the two-level pattern approx_count_distinct hides —
    partial sketches are tiny (KBs), merge is associative, so per-
    partition / per-day sketches can be stored and re-merged for any
    rollup without touching raw data (the cube problem for COUNT
    DISTINCT). Value-oracled as a TOLERANCE CONTRACT (same pattern as
    q_approx_count_distinct): the merged-sketch estimate must land
    within 15 % of the exact global distinct count — integer
    cross-multiplied, so a merge bug or register corruption fails by
    value while the engine-specific estimate never crosses engines."""
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch"))
        .cast("bigint")
        .alias("n_approx")
    )
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    diff = F.abs(F.col("n_approx") - F.col("n_exact"))
    return merged.crossJoin(exact).select(
        "n_exact",
        (diff * 100 <= F.col("n_exact") * 15).alias("within_tolerance"),
    )
