"""Analytics tier XXIV: ordered aggregation, weighted order
statistics, vocabulary application, and join-semantics variants.

New shapes over I-XXIII: exact
weighted median (cumulative-weight crossing, all-integer decision),
out-of-vocabulary rate (corpus vocabulary built then applied back to
every document — the two-phase broadcast pattern), co-purchase degree
distribution (closing the graph-stats story: degrees → histogram),
inter-order gap statistics (lag over per-customer order timelines),
and a null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM — the join
variant where NULL keys match each other).

Cross-engine exactness: string_agg ordering pinned on both sides;
weighted-median crossing decided by integer inequality (2·cumw ≥
totw); OOV and gap ratios are IEEE divisions of identical integers;
no float ever feeds a decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import (
    load,
    order_part_edges,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


# --------------------------------------------------- weighted median


@register(
    "q_weighted_median",
    oracle="""
    WITH w AS (
      SELECT c_mktsegment, c_acctbal, c_custkey,
             CAST(c_nationkey + 1 AS BIGINT) AS wt
      FROM customer
    ),
    c AS (
      SELECT c_mktsegment, c_acctbal, wt,
             CAST(SUM(wt) OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal, c_custkey
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cumw,
             CAST(SUM(wt) OVER (PARTITION BY c_mktsegment)
                  AS BIGINT) AS totw
      FROM w
    )
    SELECT c_mktsegment, MIN(c_acctbal) AS weighted_median
    FROM c WHERE 2 * cumw >= totw
    GROUP BY c_mktsegment
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median per segment (weight = nationkey+1): sort
    by value, take the first value whose cumulative weight crosses
    half the total. Both the running and total weights are int64 and
    the crossing test is the integer inequality 2·cumw ≥ totw — no
    midpoint interpolation, no float compare; rows past the crossing
    form a suffix of the value order, so MIN(value) over them IS the
    crossing value (that trick keeps the query one window + one
    aggregate instead of a rank-and-pick).

    100 TB: one shuffle on the segment key; the running sum is a sort
    within each segment partition. For heavy segments swap in the
    two-phase exact-quantile approach of q_quantile_bucket_assign
    (distribute by value range, accumulate partition weight totals)."""
    w = load(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_acctbal",
        "c_custkey",
        (F.col("c_nationkey") + 1).cast("bigint").alias("wt"),
    )
    run = (
        Window.partitionBy("c_mktsegment")
        .orderBy("c_acctbal", "c_custkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = w.select(
        "c_mktsegment",
        "c_acctbal",
        F.sum("wt").over(run).cast("bigint").alias("cumw"),
        F.sum("wt")
        .over(Window.partitionBy("c_mktsegment"))
        .cast("bigint")
        .alias("totw"),
    )
    return (
        c.filter(2 * F.col("cumw") >= F.col("totw"))
        .groupBy("c_mktsegment")
        .agg(F.min("c_acctbal").alias("weighted_median"))
    )


# ------------------------------------------------------ OOV rate


_VOCAB_N = 50


@register(
    "q_oov_rate",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
      FROM documents
    ),
    vocab AS (
      SELECT word FROM (
        SELECT word, COUNT(*) AS n FROM tok GROUP BY word
        ORDER BY n DESC, word LIMIT {_VOCAB_N}
      )
    )
    SELECT t.doc_id,
           COUNT(*) AS n_words,
           COUNT(*) FILTER (WHERE v.word IS NULL) AS n_oov,
           CAST(COUNT(*) FILTER (WHERE v.word IS NULL) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS oov_rate
    FROM tok t LEFT JOIN vocab v ON v.word = t.word
    GROUP BY t.doc_id
    """,
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate: build the corpus top-50 vocabulary
    (count-desc, word-asc total order), then score every document by
    the fraction of its tokens outside it — the two-phase
    build-then-apply pattern behind tokenizer coverage checks and
    corpus drift monitors. The rate is one IEEE division of identical
    counts.

    100 TB: phase 1 is a word-count shuffle over the token stream
    with map-side combine; the resulting vocabulary is tiny by
    construction (LIMIT N) and broadcast back, so phase 2 is a
    shuffle-free scan — the vocabulary never round-trips through the
    driver. reference: the text-analysis slot of the north star
    (BASELINE.json) alongside q_vocab_topn, which builds ids; this
    one closes the loop by applying the vocabulary."""
    tok = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    vocab = (
        tok.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(_VOCAB_N)
        .select("word", F.lit(True).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.count_if(F.col("in_vocab").isNull()).alias("n_oov"),
            (
                F.count_if(F.col("in_vocab").isNull()).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("oov_rate"),
        )
    )


# ------------------------------------------- degree distribution


@register(
    "q_degree_distribution",
    oracle="""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM d a JOIN d b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
        SELECT src AS node FROM e
        UNION ALL
        SELECT dst AS node FROM e
      ) GROUP BY node
    )
    SELECT degree, COUNT(*) AS n_nodes
    FROM deg GROUP BY degree
    """,
)
def q_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph: per-node degree,
    then the degree histogram — the first diagnostic run on any graph
    before the iterative tiers (q_pagerank / q_connected_components /
    q_triangle_count), because it reveals the hub skew that decides
    salting and orientation strategy.

    100 TB: reuses the shared basket-pair build; degrees are one
    map-side-combined count over edge endpoints, and the histogram
    collapses to |distinct degrees| rows."""
    half = order_part_edges(spark, sf_dir)
    ends = half.select(F.col("src").alias("node")).unionAll(
        half.select(F.col("dst").alias("node"))
    )
    deg = ends.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


# ------------------------------------------------ inter-order gaps


@register(
    "q_interorder_gap",
    oracle="""
    WITH g AS (
      SELECT o_custkey,
             date_diff('day',
                       LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate,
                                                       o_orderkey),
                       o_orderdate) AS gap_days
      FROM orders
    )
    SELECT o_custkey,
           COUNT(gap_days) AS n_gaps,
           CAST(SUM(gap_days) AS BIGINT) AS total_gap_days,
           CAST(CAST(SUM(gap_days) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(gap_days) AS DOUBLE) AS avg_gap_days,
           MAX(gap_days) AS max_gap_days
    FROM g WHERE gap_days IS NOT NULL
    GROUP BY o_custkey
    """,
)
def q_interorder_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase interval per customer: day gaps between
    consecutive orders (lag over the per-customer timeline), then
    count/total/mean/max per customer — the recency signal RFM's
    R-score summarizes into a quintile, kept here at full resolution.
    Gaps are integer day differences; the mean is one IEEE division
    of exact integers.

    100 TB: one shuffle on o_custkey serves both the lag window and
    the aggregate (same key — one exchange); per-customer state is
    the order count, never the fact table."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ).alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    return g.groupBy("o_custkey").agg(
        F.count("gap_days").alias("n_gaps"),
        F.sum("gap_days").cast("bigint").alias("total_gap_days"),
        (
            F.sum("gap_days").cast("bigint").cast("double")
            / F.count("gap_days").cast("double")
        ).alias("avg_gap_days"),
        F.max("gap_days").alias("max_gap_days"),
    )


# -------------------------------------------------- null-safe join


@register(
    "q_nullsafe_join",
    oracle="""
    WITH a AS (
      SELECT o_orderkey, nullif(o_orderpriority, '1-URGENT') AS pri
      FROM orders
    ),
    g AS (
      SELECT pri, COUNT(*) AS n_orders FROM a GROUP BY pri
    )
    SELECT a.o_orderkey, a.pri, g.n_orders
    FROM a JOIN g ON a.pri IS NOT DISTINCT FROM g.pri
    """,
)
def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the join-semantics variant
    plain ``=`` can't express (under ``=``, the nulled-out '1-URGENT'
    rows would drop; here they join to their own group row). Nulls are
    synthesized with nullif since the testdata is fully dense.

    100 TB: Spark plans ``<=>`` as an ordinary hash/sort-merge join on
    a null-tolerant key — but ALL null keys land in one partition, so
    a null-heavy column is the canonical skew case: pre-split nulls
    (union of a null-only branch) or salt when the null share is
    material, exactly like q_salted_aggregate's treatment of hot
    keys."""
    a = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("pri"),
    )
    g = (
        a.groupBy("pri")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(F.col("pri").alias("g_pri"), "n_orders")
    )
    return a.join(
        F.broadcast(g), F.col("pri").eqNullSafe(F.col("g_pri"))
    ).select("o_orderkey", "pri", "n_orders")
