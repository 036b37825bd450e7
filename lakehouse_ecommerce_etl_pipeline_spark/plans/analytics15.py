"""Analytics tier XV: customer/behavior analytics and join pruning.

New shapes this tier adds over I-XIV: cohort retention triangles,
market-basket co-occurrence (fact self-join), first-order Markov
transition matrices, RFM segmentation (multi-window ntile scoring),
ABC/Pareto cumulative classification, time-weighted averages over
irregular event timelines, a hand-built distributed Bloom-filter
semi-join prune (the manual analogue of Spark's runtime bloom
filter), and bag-of-words TF cosine document pairs.

Reference parity: the reference's Athena zone exists to serve exactly
these marketing/ops questions over orders + order_items
(README.md:30, docs/full_implementation_guide.md:152-153 list derived
enrichment + behavior anomaly detection as intended features); none
are implemented there — this tier is the extension SURVEY.md §2.13
commits to.

Cross-engine exactness (oracle-parity-cookbook): decimal sums with
sized precisions, integer/decimal threshold algebra instead of float
compares where a *decision* depends on it, total orders under every
ntile/limit, CAST around DuckDB's HUGEINT sums, IEEE division/sqrt
only as a final projection of identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.operators.aggregates import (
    dsum,
    sql_dsum,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import (
    load,
    order_part_pairs,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


# ------------------------------------------------------- cohort retention


@register(
    "q_cohort_retention",
    oracle="""
    WITH o AS (
      SELECT o_custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INTEGER) AS midx
      FROM orders
    ),
    f AS (SELECT o_custkey, MIN(midx) AS cohort_idx FROM o GROUP BY o_custkey)
    SELECT f.cohort_idx AS cohort_idx,
           o.midx - f.cohort_idx AS month_offset,
           COUNT(DISTINCT o.o_custkey) AS n_users
    FROM o JOIN f USING (o_custkey)
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: customers grouped by the month of
    their first order (cohort), counted as active in each later month
    offset. Months are a linear integer index (year*12+month) so the
    offset subtraction is exact integer arithmetic on both engines.

    100 TB: two shuffles — min-per-customer (map-side combinable) and
    the (cohort, offset) count-distinct. The self-join on o_custkey
    co-partitions with the first aggregate, so AQE reuses the
    exchange; the distinct-count key space (customers) is the only
    wide state."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("int")
        .alias("midx"),
    )
    first = o.groupBy("o_custkey").agg(F.min("midx").alias("cohort_idx"))
    return (
        o.join(first, "o_custkey")
        .groupBy(
            F.col("cohort_idx"),
            (F.col("midx") - F.col("cohort_idx")).alias("month_offset"),
        )
        .agg(F.count_distinct("o_custkey").alias("n_users"))
    )


# ------------------------------------------------------- market basket


@register(
    "q_market_basket",
    oracle="""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           COUNT(*) AS n_orders
    FROM d a JOIN d b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 50
    """,
)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: top part pairs appearing in the
    same order (the a-priori candidate-pair primitive). Distinct
    (order, part) first so multi-line orders don't inflate counts;
    `part_a < part_b` keeps one canonical orientation per pair.

    100 TB: the self-join is co-partitioned on l_orderkey — one
    shuffle of the deduped pair list, no broadcast needed, and the
    per-order blowup is bounded by basket size squared (baskets are
    small; a pathological giant basket would need a per-order items
    cap before the join). Total order under the LIMIT for a
    deterministic cutoff."""
    return (
        order_part_pairs(spark, sf_dir)
        .select(F.col("src").alias("part_a"), F.col("dst").alias("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(50)
    )


# ------------------------------------------------------- event transitions


@register(
    "q_event_transitions",
    oracle="""
    WITH s AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    c AS (
      SELECT from_type, to_type, COUNT(*) AS n_trans
      FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n_trans,
           CAST(n_trans AS DOUBLE) /
           CAST(CAST(SUM(n_trans) OVER (PARTITION BY from_type) AS BIGINT)
                AS DOUBLE) AS p_trans
    FROM c
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the event stream:
    per-user consecutive event-type bigrams (lead over a total
    (ts, event_id) order), counted globally, with row-normalized
    transition probabilities. The probability is one IEEE division of
    two identical integers — bit-equal on both engines.

    100 TB: lead() shuffles once on user_id (high cardinality, no
    skew); the transition count is a tiny (|types|²) aggregate that
    map-side combines to nothing. This is the sessionless cousin of
    q_sessionize/q_funnel_ordered."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = (
        load(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    wt = Window.partitionBy("from_type")
    return c.select(
        "from_type",
        "to_type",
        "n_trans",
        (
            F.col("n_trans").cast("double")
            / F.sum("n_trans").over(wt).cast("bigint").cast("double")
        ).alias("p_trans"),
    )


# ------------------------------------------------------- RFM segmentation


@register(
    "q_rfm_segments",
    oracle=f"""
    WITH base AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS frequency,
             {sql_dsum("o_totalprice", "monetary")}
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, last_order, frequency, monetary,
           CAST(ntile(5) OVER (ORDER BY last_order DESC, o_custkey)
                AS INTEGER) AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey)
                AS INTEGER) AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary DESC, o_custkey)
                AS INTEGER) AS m_score
    FROM base
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: quintile scores (1 = best) for
    recency of last order, order frequency, and decimal-exact monetary
    total. Every ntile runs over a totally-ordered window (custkey
    tiebreak) and monetary is the associative decimal sum, so both
    engines cut identical quintiles.

    PRODUCTION PLAN: all three quintiles run through the boundary-cut
    exact global ntile (operators/ranks.py, DESC) — no unpartitioned
    window at customer grain; the timestamp probes on unix_micros and
    the decimal probe on a monotone double cast, with the in-bucket
    order still the true (col DESC, custkey) total order, so scores
    are bit-equal to the NTILE twin (pytest-pinned; oracle
    unchanged)."""
    from lakehouse_ecommerce_etl_pipeline_spark.operators.ranks import (
        RankSpec,
        with_global_ntiles,
    )

    base = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            dsum("o_totalprice", "monetary"),
        )
        .withColumn("__r_us", F.unix_micros("last_order"))
        .withColumn("__m_dbl", F.col("monetary").cast("double"))
    )
    # all three scores are independent orders of the same customer-
    # grain rows: ONE multi-ntile call shares the probe/counts actions
    # across the three dims instead of three sequential passes (each
    # of which would re-execute everything upstream under its own
    # driver actions).  frequency is a narrow integer domain whose
    # modal value is a fat tie class at scale — its dim auto-splits on
    # the customer key.
    tiled = with_global_ntiles(
        base,
        [
            RankSpec([F.desc("last_order"), "o_custkey"], primary="__r_us",
                     descending=True, rn="r_score", secondary="o_custkey",
                     k=5),
            RankSpec([F.desc("frequency"), "o_custkey"], primary="frequency",
                     descending=True, rn="f_score", secondary="o_custkey",
                     k=5),
            RankSpec([F.desc("monetary"), "o_custkey"], primary="__m_dbl",
                     descending=True, rn="m_score", secondary="o_custkey",
                     k=5),
        ],
    )
    return tiled.select(
        "o_custkey",
        "last_order",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
    )


def q_rfm_segments_window_form(spark: SparkSession, sf_dir: str):
    """NTILE oracle-exactness twin (former production plan),
    pytest-pinned equal to the boundary-cut form."""
    base = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            dsum("o_totalprice", "monetary"),
        )
    )
    wr = Window.orderBy(F.desc("last_order"), "o_custkey")
    wf = Window.orderBy(F.desc("frequency"), "o_custkey")
    wm = Window.orderBy(F.desc("monetary"), "o_custkey")
    return base.select(
        "o_custkey",
        "last_order",
        "frequency",
        "monetary",
        F.ntile(5).over(wr).cast("int").alias("r_score"),
        F.ntile(5).over(wf).cast("int").alias("f_score"),
        F.ntile(5).over(wm).cast("int").alias("m_score"),
    )


# ------------------------------------------------------- ABC classification

# exact 1e-4-dollar int64 revenue term (DESIGN §21 rule 3)
_REV = (
    "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"
)


@register(
    "q_abc_classification",
    oracle=f"""
    WITH r AS (
      SELECT l_partkey, SUM({_REV}) AS rev
      FROM lineitem GROUP BY l_partkey
    ),
    c AS (
      SELECT l_partkey, rev,
             SUM(rev) OVER (ORDER BY rev DESC, l_partkey) AS cum,
             SUM(rev) OVER () AS total
      FROM r
    )
    SELECT l_partkey,
           CAST(rev AS DOUBLE) / 10000.0 AS revenue,
           CASE WHEN cum * 5 <= total * 4 THEN 'A'
                WHEN cum * 20 <= total * 19 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c
    """,
)
def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory classification: parts ranked by
    exact integer 1e-4-dollar discounted revenue (DESIGN §21 rule 3);
    the cumulative share boundary is decided in exact integer algebra
    (cum*5 <= total*4 is "cumulative share ≤ 80%") — no float
    threshold anywhere a class label depends on. A = first 80% of
    revenue, B = next 15%, C = tail.

    PRODUCTION PLAN: the cumulative revenue is the boundary-cut
    parallel prefix sum (operators/ranks.py — literal percentile cuts
    of revenue, per-bucket windows, exact decimal offsets); the grand
    total is a 1-row aggregate broadcast back.  No unpartitioned
    window at any grain: a 100 TB part catalog is 10^7-10^8 rows, not
    a single-reducer dimension.  Bit-equal to the window form (int64
    sums are exact under any grouping); twin pytest-pinned.  The
    Spark-side DECIMAL(38,0) widening of cum/total before the *5/*20
    products is pure integer headroom for extreme SF (global 1e-4
    revenue ≈ 6.6e21 at 100 TB busts int64; the oracle's DuckDB side
    rides HUGEINT natively — values identical, types immaterial)."""
    from lakehouse_ecommerce_etl_pipeline_spark.operators.ranks import (
        with_global_running_sum,
    )

    r = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.expr(f"SUM({_REV})").alias("rev_d"))
    )
    run = with_global_running_sum(
        r,
        [F.desc("rev_d"), "l_partkey"],
        primary="rev_d",
        value_col="rev_d",
        alias="cum",
        descending=True,
        secondary="l_partkey",
    )
    total = r.agg(F.sum("rev_d").cast("decimal(38,0)").alias("total"))
    c = run.select(
        "l_partkey",
        "rev_d",
        F.col("cum").cast("decimal(38,0)").alias("cum"),
    ).crossJoin(F.broadcast(total))
    return c.select(
        "l_partkey",
        (F.col("rev_d").cast("double") / F.lit(10000.0)).alias("revenue"),
        F.when(F.col("cum") * 5 <= F.col("total") * 4, "A")
        .when(F.col("cum") * 20 <= F.col("total") * 19, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


def q_abc_classification_window_form(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cumulative-window oracle-exactness twin (former production
    plan), pytest-pinned equal to the boundary-cut prefix sum."""
    r = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.expr(f"SUM({_REV})").alias("rev"))
    )
    wcum = Window.orderBy(F.desc("rev"), "l_partkey")
    c = r.select(
        "l_partkey",
        F.col("rev").alias("rev_d"),
        F.sum("rev").over(wcum).cast("decimal(38,0)").alias("cum"),
        F.sum("rev").over(Window.partitionBy()).cast("decimal(38,0)").alias("total"),
    )
    return c.select(
        "l_partkey",
        (F.col("rev_d").cast("double") / F.lit(10000.0)).alias("revenue"),
        F.when(F.col("cum") * 5 <= F.col("total") * 4, "A")
        .when(F.col("cum") * 20 <= F.col("total") * 19, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


# ------------------------------------------------------- time-weighted avg


@register(
    "q_time_weighted_avg",
    oracle="""
    WITH s AS (
      SELECT user_id, value,
             date_diff('second', ts,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               AS dur_s
      FROM events
    )
    SELECT user_id,
           CAST(SUM(dur_s) AS BIGINT) AS total_s,
           CAST(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT) * dur_s)
                     AS BIGINT) AS DOUBLE) / 100.0
             / CAST(CAST(SUM(dur_s) AS BIGINT) AS DOUBLE) AS twa_value
    FROM s
    WHERE dur_s IS NOT NULL
    GROUP BY user_id
    HAVING SUM(dur_s) > 0
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of the event value per user: each
    reading holds until the next one (step interpolation), weighted
    by its duration in whole seconds. Weights are epoch-second
    differences (integer on both engines — Spark floor-divides
    micros, DuckDB date_diff counts second boundaries; equal for
    positive epochs); value×duration runs in decimal(20,8)×(10,0) →
    exact ≤38-digit products; one final IEEE division.

    100 TB: the lead() is one shuffle on user_id; the aggregate
    combines map-side. This is the time-series companion of
    q_gapfill_locf — integral of the LOCF curve rather than its
    resampling."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "value",
        (
            (F.unix_micros(F.lead("ts").over(w)) / F.lit(1000000)).cast("long")
            - (F.unix_micros("ts") / F.lit(1000000)).cast("long")
        ).alias("dur_s"),
    ).filter(F.col("dur_s").isNotNull())
    return (
        s.groupBy("user_id")
        .agg(
            F.sum("dur_s").alias("total_s"),
            F.sum(
                F.round(F.col("value") * 100).cast("bigint")
                * F.col("dur_s")
            )
            .cast("bigint")
            .cast("double")
            .alias("wsum100"),
        )
        .filter(F.col("total_s") > 0)
        .select(
            "user_id",
            "total_s",
            (
                F.col("wsum100")
                / F.lit(100.0)
                / F.col("total_s").cast("double")
            ).alias("twa_value"),
        )
    )


# ------------------------------------------------------- bloom-filter prune

_BLOOM_BITS = 1 << 17  # m: 131072 bits = 2048 64-bit words
_BLOOM_HASHES = 3  # k


@register(
    "q_bloom_prefilter_join",
    oracle="""
    SELECT l_orderkey, l_partkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_orderkey IN
          (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
    """,
)
def q_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join with a hand-built distributed Bloom-filter prune:
    the high-value-orders key set is folded into a 131072-bit filter
    (k=3 xxhash64 probes, bit_or over 64-bit words — a ~2048-row
    aggregate), broadcast, and probed JVM-side to drop most lineitem
    keys before the exact semi-join removes the false positives. The
    final result is exactly the plain semi-join, so it oracles against
    the IN-subquery — the Bloom stage can only prune, never change
    the answer.

    This is the manual analogue of Spark's runtime bloom filter
    (spark.sql.optimizer.runtime.bloomFilter.*), written out as
    operators because at 100 TB you want to build the filter ONCE and
    persist it across incremental loads, which the optimizer-injected
    version can't do. Fact rows NEVER shuffle and fact KEYS never
    shuffle either: the ~2048-word filter densifies into one
    array<bigint> row that cross-broadcasts onto the fact scan, and
    every row tests its k bits in a map-side projection (O(1)
    element_at per probe) — the round-3 form routed a DISTINCT of all
    fact keys through an exchange first, which became the query's
    entire growth term at sf1 (the probe side is the 100 TB side)."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    seeds = F.array(*[F.lit(i) for i in range(_BLOOM_HASHES)])

    # NO distinct on the key set (r12, guide §2.4 "a distinct on data
    # that is already unique"): o_orderkey is the orders PK, and both
    # consumers are duplicate-insensitive anyway (bit_or absorbs
    # repeats; leftsemi ignores build-side multiplicity) — the removed
    # exchange was pure cost. A/B min-of-4 at sf0.1: 1.33 → 1.08 s,
    # identical 120k-row output.
    dim = orders.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_orderkey").alias("k")
    )
    words = (
        dim.select("k", F.explode(seeds).alias("seed"))
        .selectExpr(f"pmod(xxhash64(seed, k), {_BLOOM_BITS}L) AS pos")
        .selectExpr("pos div 64 AS word", "CAST(pos % 64 AS INT) AS bit")
        .groupBy("word")
        .agg(F.expr("bit_or(shiftleft(1L, bit))").alias("mask"))
    )
    # densify the sparse (word, mask) rows into ONE array<bigint> row
    # (index = word); computed once on the 1-row side of the broadcast
    bloom_row = words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "mask"))).alias("m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(_BLOOM_BITS // 64 - 1)),
            lambda w: F.coalesce(
                F.try_element_at(F.col("m"), w.cast("long")),
                F.lit(0).cast("long"),
            ),
        ).alias("bloom")
    )

    # map-side probe: k hash positions per fact row, k O(1) bit tests
    # against the broadcast array — no distinct, no probe-side exchange
    lic = li.join(F.broadcast(bloom_row))
    pos_cols = []
    for i in range(_BLOOM_HASHES):
        lic = lic.withColumn(
            f"_p{i}",
            F.expr(f"pmod(xxhash64({i}, l_orderkey), {_BLOOM_BITS}L)"),
        )
        pos_cols.append(f"_p{i}")
    cond = None
    for c in pos_cols:
        ok = F.expr(
            f"(element_at(bloom, CAST({c} div 64 AS INT) + 1)"
            f" & shiftleft(1L, CAST({c} % 64 AS INT))) != 0"
        )
        cond = ok if cond is None else (cond & ok)
    pruned = lic.filter(cond).drop("bloom", *pos_cols)

    exact = pruned.join(
        F.broadcast(dim), pruned["l_orderkey"] == dim["k"], "leftsemi"
    )
    return exact.select(
        "l_orderkey", "l_partkey", "l_linenumber", "l_extendedprice"
    )


# ------------------------------------------------------- TF cosine pairs

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@register(
    "q_tf_cosine_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok
      FROM documents WHERE doc_id < 60
    ),
    cnt AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM tok WHERE tok <> '' GROUP BY doc_id, tok
    ),
    n2 AS (SELECT doc_id, CAST(SUM(c * c) AS BIGINT) AS norm2
           FROM cnt GROUP BY doc_id),
    dot AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(SUM(a.c * b.c) AS BIGINT) AS dot
      FROM cnt a JOIN cnt b
        ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT d.doc_a, d.doc_b, d.dot,
           CAST(d.dot AS DOUBLE) /
           sqrt(CAST(na.norm2 * nb.norm2 AS DOUBLE)) AS cosine
    FROM dot d
    JOIN n2 na ON na.doc_id = d.doc_a
    JOIN n2 nb ON nb.doc_id = d.doc_b
    ORDER BY cosine DESC, doc_a, doc_b
    LIMIT 40
    """,
)
def q_tf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words cosine similarity between document pairs via the
    sparse inner product: explode term counts, join on token, sum
    c_a*c_b (integer-exact), normalize by the exact integer squared
    norms — sqrt and one division are the only float steps, applied
    to identical integers on both engines. The lexical companion of
    q_embedding_near_dup (dense) and q_jaccard_pairs (set-based).

    100 TB: the token join is the classic inverted-index self-join —
    shuffle on token, and stop-word-like hub tokens are the skew
    hazard (cap df or drop top-df tokens before joining, exactly what
    the LSH tier does with banding instead). Doc subset here keeps the
    quadratic pair space test-sized; the operator itself is
    corpus-scale."""
    from lakehouse_ecommerce_etl_pipeline_spark.llm.dedup import tokens

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    cnt = (
        tokens(docs, "doc_id", "text", distinct=False)
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n2 = cnt.groupBy("doc_id").agg(
        F.sum(F.col("c") * F.col("c")).alias("norm2")
    )
    a = cnt.select(
        F.col("doc_id").alias("doc_a"), "tok", F.col("c").alias("ca")
    )
    b = cnt.select(
        F.col("doc_id").alias("doc_b"), "tok", F.col("c").alias("cb")
    )
    dot = (
        a.join(b, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    na = n2.select(F.col("doc_id").alias("doc_a"), F.col("norm2").alias("na2"))
    nb = n2.select(F.col("doc_id").alias("doc_b"), F.col("norm2").alias("nb2"))
    return (
        dot.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "dot",
            (
                F.col("dot").cast("double")
                / F.sqrt((F.col("na2") * F.col("nb2")).cast("double"))
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "doc_a", "doc_b")
        .limit(40)
    )
