"""Analytics tier XXIII: temporal joins, basket rules, and exact
allocation/attribution arithmetic.

New shapes over I-XXII: point-in-time (interval) join of facts against
an SCD2 dimension, association rules (support/confidence/lift) on the
co-purchase pairs, largest-remainder cent allocation (the classic
"distribute a rounded invoice across lines" problem, all-integer),
time-bucketed dedup (the batch oracle of
``dropDuplicatesWithinWatermark``), Gopher/C4-style document quality
gates (array-internal, zero-shuffle), linear marketing attribution
over a bounded lookback (rational credits quantized before the sum),
and a trailing-window z-score anomaly flag whose decision is exact
decimal algebra (cross-multiplied variance inequality, no float
compare).

Reference parity: the reference's docs promise enrichment + anomaly
detection on ordering behavior (docs/full_implementation_guide.md:
152-153) with no code; its Athena zone exists to serve exactly these
order/behavior questions (README.md:30). This tier extends SURVEY.md
§2.13 with the temporal/allocation shapes a lakehouse serves daily.

Cross-engine exactness (house cookbook): decisions ride on integer or
decimal algebra only; IEEE division appears solely as a final
projection of identical exact operands; doubles are summed only after
tie-safe decimal quantization; every ranking carries a total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import (
    load,
    order_part_pairs,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


# ---------------------------------------------- point-in-time SCD2 join


@register(
    "q_pointintime_scd2_join",
    oracle="""
    WITH browse AS (
      SELECT user_id, ts, event_id, event_type
      FROM events WHERE event_type IN ('click', 'view')
    ),
    changes AS (
      SELECT user_id, ts, event_id, event_type
      FROM (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM browse
      ) t
      WHERE prev_type IS NULL OR event_type <> prev_type
    ),
    hist AS (
      SELECT user_id, event_type AS state, ts AS eff_from,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS eff_to
      FROM changes
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           h.state, h.eff_from AS state_since
    FROM events p
    LEFT JOIN hist h
      ON h.user_id = p.user_id
     AND h.eff_from <= p.ts
     AND (h.eff_to IS NULL OR p.ts < h.eff_to)
    WHERE p.event_type = 'purchase'
    """,
)
def q_pointintime_scd2_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each purchase is enriched with the browsing
    state (last click-vs-view run) in effect at its timestamp — facts
    against an SCD2 dimension's validity intervals, the lakehouse
    lookup that plain equi-joins can't express. Intervals are disjoint
    half-open per user, so each probe matches at most one version;
    LEFT keeps purchases that precede any browsing history.

    100 TB: the equi component (user_id) carries the shuffle — Spark
    plans a sort-merge join on user_id with the interval bounds as a
    join-level range filter; per-user version chains are short, so the
    per-key cross-check is bounded. A broadcast of the dimension wins
    when the SCD2 table is small; for fact×fact scale, bucket both
    sides on user_id (sinks/bucketing.py) so the join is shuffle-free.

    reference: the orders/order_items Delta tables are Type-1 (MERGE
    last-write-wins, orders_etl.py:82-91); this is the Type-2 read
    path the docs' history claims would need."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    browse = ev.filter(F.col("event_type").isin("click", "view"))
    changes = browse.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(
        F.col("prev_type").isNull()
        | (F.col("event_type") != F.col("prev_type"))
    )
    hist = changes.select(
        F.col("user_id").alias("h_user"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("eff_from"),
        F.lead("ts").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("eff_to"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    cond = (
        (hist["h_user"] == purchases["user_id"])
        & (hist["eff_from"] <= purchases["ts"])
        & (hist["eff_to"].isNull() | (purchases["ts"] < hist["eff_to"]))
    )
    return purchases.join(hist, cond, "left").select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "state",
        F.col("eff_from").alias("state_since"),
    )


# ---------------------------------------------------- association rules


_MIN_PAIR_SUPPORT = 3


@register(
    "q_association_rules",
    oracle=f"""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pair AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS n_ab
      FROM d a JOIN d b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {_MIN_PAIR_SUPPORT}
    ),
    item AS (SELECT l_partkey, COUNT(*) AS n_item FROM d GROUP BY 1),
    tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM d)
    SELECT p.part_a, p.part_b, p.n_ab,
           ia.n_item AS n_a, ib.n_item AS n_b,
           CAST(p.n_ab AS DOUBLE) / CAST(ia.n_item AS DOUBLE)
             AS confidence_a_to_b,
           CAST(p.n_ab * t.n_orders AS DOUBLE)
             / CAST(ia.n_item * ib.n_item AS DOUBLE) AS lift
    FROM pair p
    JOIN item ia ON ia.l_partkey = p.part_a
    JOIN item ib ON ib.l_partkey = p.part_b
    CROSS JOIN tot t
    """,
)
def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over co-purchased parts: pair support from the
    shared basket-pair build, per-item order counts, and
    confidence/lift as single IEEE divisions of exact integer counts
    (numerator and denominator products stay far below 2^53 — both
    engines divide identical operands). The support floor prunes the
    quadratic pair tail before any join.

    100 TB: pair mining is the one heavy shuffle (see
    order_part_pairs); item counts and the scalar order total are
    broadcast to the surviving pairs — the a-priori pattern where
    candidate pruning happens before enrichment, never after."""
    d = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    pair = (
        order_part_pairs(spark, sf_dir)
        .groupBy(F.col("src").alias("part_a"), F.col("dst").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _MIN_PAIR_SUPPORT)
    )
    item = d.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    n_orders = d.select("l_orderkey").distinct().count()
    ia = item.select(
        F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a")
    )
    ib = item.select(
        F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b")
    )
    return (
        pair.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            (F.col("n_ab").cast("double") / F.col("n_a").cast("double")).alias(
                "confidence_a_to_b"
            ),
            # lift's count products run on DECIMAL(38,0) (the
            # q_ks_drift discipline): n_ab·N and n_a·n_b are ≤ N² and
            # would throw under ANSI int64 at ~3e9 baskets; pair-grain
            # rows make the widening free, and decimal→double rounds
            # to the same nearest double — bit-equal release.
            (
                (
                    F.col("n_ab").cast("decimal(38,0)")
                    * F.lit(n_orders).cast("decimal(38,0)")
                ).cast("double")
                / (
                    F.col("n_a").cast("decimal(38,0)")
                    * F.col("n_b").cast("decimal(38,0)")
                ).cast("double")
            ).alias("lift"),
        )
    )


# -------------------------------------- largest-remainder allocation


@register(
    "q_allocation_largest_remainder",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_linenumber,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS w_cents
      FROM lineitem
    ),
    o AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS target_cents
      FROM orders
    ),
    j AS (
      SELECT li.l_orderkey, li.l_linenumber, li.w_cents, o.target_cents,
             CAST(SUM(li.w_cents) OVER (PARTITION BY li.l_orderkey)
                  AS BIGINT) AS sum_w
      FROM li JOIN o ON o.o_orderkey = li.l_orderkey
    ),
    b AS (
      SELECT l_orderkey, l_linenumber, target_cents,
             (target_cents * w_cents) // sum_w AS base_cents,
             (target_cents * w_cents) % sum_w AS rem,
             ROW_NUMBER() OVER (
               PARTITION BY l_orderkey
               ORDER BY (target_cents * w_cents) % sum_w DESC,
                        l_linenumber) AS rk
      FROM j
    ),
    d AS (
      SELECT *,
             target_cents
             - CAST(SUM(base_cents) OVER (PARTITION BY l_orderkey)
                    AS BIGINT) AS deficit
      FROM b
    )
    SELECT l_orderkey, l_linenumber,
           base_cents + CASE WHEN rk <= deficit THEN 1 ELSE 0 END
             AS alloc_cents
    FROM d
    """,
)
def q_allocation_largest_remainder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Largest-remainder allocation: distribute each order's invoice
    total (in cents) across its line items proportional to extended
    price, so the per-line cents sum EXACTLY to the order total — the
    canonical financial-allocation operator. All arithmetic is 64-bit
    integer (floor-to-cents, integer div/mod, remainder ranking), so
    the result is bit-identical on any engine; the worst intermediate
    (target_cents × w_cents ≈ 5e14) is far inside int64. The remainder
    rank's (rem DESC, l_linenumber) order is total except between
    duplicated physical lines (lineitem carries dup (order, line)
    keys), which are byte-identical rows — whichever one takes the
    extra cent, the output MULTISET is the same, so the
    order-insensitive oracle hash is still deterministic.

    100 TB: one fact shuffle on l_orderkey serves the order join, both
    window sums, and the remainder rank (same partition key — Catalyst
    plans a single exchange); orders co-partition with lineitem.
    Window-heavy but state per key is the basket, not the table."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("w_cents"),
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.floor(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("target_cents"),
    )
    pw = Window.partitionBy("l_orderkey")
    j = li.join(o, "l_orderkey").withColumn(
        "sum_w", F.sum("w_cents").over(pw)
    )
    j = j.select(
        "l_orderkey",
        "l_linenumber",
        "target_cents",
        F.expr("(target_cents * w_cents) div sum_w").alias("base_cents"),
        ((F.col("target_cents") * F.col("w_cents")) % F.col("sum_w")).alias(
            "rem"
        ),
    )
    j = j.withColumn(
        "rk",
        F.row_number().over(pw.orderBy(F.desc("rem"), "l_linenumber")),
    ).withColumn(
        "deficit", F.col("target_cents") - F.sum("base_cents").over(pw)
    )
    return j.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("base_cents")
            + F.when(F.col("rk") <= F.col("deficit"), 1).otherwise(0)
        ).alias("alloc_cents"),
    )


# ------------------------------------------------- time-bucketed dedup


@register(
    "q_windowed_dedup",
    oracle="""
    SELECT event_id, user_id, event_type,
           date_trunc('hour', ts) AS bucket_start, ts
    FROM (
      SELECT event_id, user_id, event_type, ts,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type, date_trunc('hour', ts)
               ORDER BY ts, event_id) AS rk
      FROM events
    ) t WHERE rk = 1
    """,
)
def q_windowed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed dedup: first event per (user, type) within each
    hour — the batch oracle of streaming
    ``dropDuplicatesWithinWatermark`` (streaming/ingest.py): identical
    keep-first semantics with the bucket standing in for watermark
    state expiry.

    100 TB: one shuffle on the (user, type, bucket) grain; the bucket
    component keeps per-partition window state bounded however long
    the history grows — the same reason the streaming variant can
    expire state."""
    w = Window.partitionBy(
        "user_id", "event_type", F.date_trunc("hour", "ts")
    ).orderBy("ts", "event_id")
    return (
        load(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.date_trunc("hour", "ts").alias("bucket_start"),
            "ts",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


# --------------------------------------------- document quality gates


@register(
    "q_doc_quality_filters",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words,
             length(text) AS n_chars
      FROM documents
    ),
    m AS (
      SELECT doc_id, words,
             len(words) AS n_words,
             n_chars - (len(words) - 1) AS sum_wlen,
             len(list_distinct(words)) AS n_distinct,
             len(list_filter(words, x -> x IN ('a', 'the')))
               AS n_stopwords
      FROM w
    ),
    f AS (
      SELECT doc_id, words, n_words, sum_wlen, n_distinct, n_stopwords,
             (SELECT MAX(c) FROM (
                SELECT COUNT(*) AS c FROM UNNEST(words) AS u(word)
                GROUP BY word)) AS max_freq
      FROM m
    )
    SELECT doc_id, n_words, sum_wlen, n_distinct, n_stopwords, max_freq,
           CAST(sum_wlen AS DOUBLE) / CAST(n_words AS DOUBLE)
             AS mean_word_len,
           CAST(n_stopwords AS DOUBLE) / CAST(n_words AS DOUBLE)
             AS stopword_ratio,
           CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE)
             AS type_token_ratio,
           (n_words >= 20
            AND 3 * n_words <= sum_wlen AND sum_wlen <= 8 * n_words
            AND 5 * max_freq <= n_words
            AND 10 * n_distinct >= n_words) AS keep
    FROM f
    """,
)
def q_doc_quality_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style document quality gates: word count, mean word
    length, stopword ratio, type-token ratio, and max single-word
    share, with the keep decision expressed as cross-multiplied
    INTEGER inequalities (``3·n ≤ Σlen ≤ 8·n`` etc.) so no float
    threshold is ever compared. Every metric is array-internal —
    split once, then size/distinct/filter/most-frequent inside the
    row (the max-frequency scan is O(|vocab|·|words|) per doc against
    the distinct array) — zero shuffles, full codegen.

    100 TB: embarrassingly parallel scan; this is the cheap first
    gate of the LLM corpus funnel, upstream of the shuffle-bearing
    dedup tiers (llm/dedup.py). reference: the quality-rule slot of
    product_etl.py:54-57 generalized from null checks to content
    heuristics."""
    w = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.split("text", " ").alias("words"),
        F.length("text").alias("n_chars"),
    )
    m = w.select(
        "doc_id",
        "words",
        F.size("words").alias("n_words"),
        (F.col("n_chars") - (F.size("words") - 1)).alias("sum_wlen"),
        F.size(F.array_distinct("words")).alias("n_distinct"),
        F.size(
            F.filter("words", lambda x: x.isin("a", "the"))
        ).alias("n_stopwords"),
    )
    # per-doc modal frequency without a shuffle: for each distinct word,
    # count its occurrences in the full array; take the max
    max_freq = F.array_max(
        F.transform(
            F.array_distinct("words"),
            lambda d: F.size(F.filter("words", lambda x: x == d)),
        )
    )
    f = m.withColumn("max_freq", max_freq).drop("words")
    nw = F.col("n_words")
    return f.select(
        "doc_id",
        "n_words",
        "sum_wlen",
        "n_distinct",
        "n_stopwords",
        "max_freq",
        (F.col("sum_wlen").cast("double") / nw.cast("double")).alias(
            "mean_word_len"
        ),
        (F.col("n_stopwords").cast("double") / nw.cast("double")).alias(
            "stopword_ratio"
        ),
        (F.col("n_distinct").cast("double") / nw.cast("double")).alias(
            "type_token_ratio"
        ),
        (
            (nw >= 20)
            & (3 * nw <= F.col("sum_wlen"))
            & (F.col("sum_wlen") <= 8 * nw)
            & (5 * F.col("max_freq") <= nw)
            & (10 * F.col("n_distinct") >= nw)
        ).alias("keep"),
    )


# ------------------------------------------------ linear attribution


@register(
    "q_attribution_linear",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT p.event_id, e.event_type AS channel, COUNT(*) AS n_c
      FROM p JOIN events e
        ON e.user_id = p.user_id
       AND e.ts < p.ts
       AND e.ts >= p.ts - INTERVAL 24 HOUR
       AND e.event_type <> 'purchase'
      GROUP BY 1, 2
    ),
    k AS (
      SELECT event_id, CAST(SUM(n_c) AS BIGINT) AS k_total
      FROM touch GROUP BY 1
    )
    SELECT t.channel,
           CAST(CAST(SUM(CAST(floor(
               CAST(t.n_c AS DOUBLE) / CAST(k.k_total AS DOUBLE) * 1e12
             ) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12 AS total_credit,
           COUNT(DISTINCT t.event_id) AS n_purchases
    FROM touch t JOIN k USING (event_id)
    GROUP BY t.channel
    """,
)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-touch) marketing attribution: each purchase splits
    one unit of credit equally across the user's non-purchase touches
    in the preceding 24 h; channel credit is the sum of per-purchase
    shares. Each share n_c/k is one IEEE division of identical exact
    integers, then floor-scaled to an integer picotunit
    (``floor(x·1e12)``) *before* the channel sum so the reduction is
    exact and associative — floor after an identical IEEE multiply is
    rounding-mode-free, unlike double→decimal casts, which Spark
    performs on the shortest decimal rendering and DuckDB on the true
    binary value (divergent at ~15 significant digits).

    100 TB: the touch join is equi on user_id with a bounded time
    range — sort-merge on user, per-user state capped by the 24 h
    lookback (the same bound that makes the streaming interval join's
    state finite, streaming/joins.py). Everything after is small-key
    aggregation."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    e = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    touch = (
        p.join(
            e,
            (F.col("t_user") == F.col("p_user"))
            & (F.col("t_ts") < F.col("p_ts"))
            & (
                F.col("t_ts")
                >= F.col("p_ts") - F.expr("INTERVAL 24 HOURS")
            ),
        )
        .groupBy("event_id", "channel")
        .agg(F.count(F.lit(1)).alias("n_c"))
    )
    k = touch.groupBy("event_id").agg(
        F.sum("n_c").cast("bigint").alias("k_total")
    )
    share = F.col("n_c").cast("double") / F.col("k_total").cast("double")
    return (
        touch.join(k, "event_id")
        .groupBy("channel")
        .agg(
            (
                F.sum(F.floor(share * F.lit(1e12)).cast("bigint"))
                .cast("bigint")
                .cast("double")
                / F.lit(1e12)
            ).alias("total_credit"),
            F.count_distinct("event_id").alias("n_purchases"),
        )
    )


# -------------------------------------- trailing-window z-score flag


@register(
    "q_trailing_zscore_anomaly",
    oracle="""
    WITH q AS (
      SELECT event_id, user_id, ts, value,
             CAST(ROUND(value * 100) AS BIGINT) AS vq
      FROM events
    ),
    w AS (
      SELECT event_id, user_id, ts, value, vq,
             COUNT(*) OVER tw AS n_prior,
             SUM(vq) OVER tw AS s,
             SUM(vq * vq) OVER tw AS ssq
      FROM q
      WINDOW tw AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, ts, value, n_prior,
           CAST(CAST(s AS BIGINT) AS DOUBLE) / 100.0 AS win_sum
    FROM w
    WHERE n_prior >= 10
      AND (n_prior * vq - s) * (n_prior * vq - s)
          > 9 * (n_prior * ssq - s * s)
    """,
)
def q_trailing_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly flag: an event is anomalous when its
    value sits more than 3σ from the mean of the user's previous ≤20
    events. The decision is the cross-multiplied inequality
    ``(n·v − Σv)² > 9·(n·Σv² − (Σv)²)`` over BIGINT integer-cents
    values (DESIGN §21 rule 3 — the inequality is homogeneous of
    degree 2 in the value scale, so the ×100 lattice preserves it
    EXACTLY; worst intermediate ≈ 1.6e11 ≪ 2^63 since the frame is
    capped at 20 rows) — exact integer algebra, never a
    float-vs-float threshold; the windowed z-score cousin of the
    global q_anomaly_zscore.

    100 TB: one shuffle on user_id; the 20-row trailing frame keeps
    window state O(1) per row. This is the batch twin of a stateful
    streaming detector (transformWithState carrying the same two
    running moments)."""
    vq = F.round(F.col("value") * 100).cast("bigint")
    tw = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    w = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        "value",
        vq.alias("vq"),
        F.count(F.lit(1)).over(tw).alias("n_prior"),
        F.sum(vq).over(tw).alias("s"),
        F.sum(vq * vq).over(tw).alias("ssq"),
    )
    dev = F.col("n_prior") * F.col("vq") - F.col("s")
    var_num = F.col("n_prior") * F.col("ssq") - F.col("s") * F.col("s")
    return (
        w.filter((F.col("n_prior") >= 10) & (dev * dev > 9 * var_num))
        .select(
            "event_id",
            "user_id",
            "ts",
            "value",
            "n_prior",
            (F.col("s").cast("double") / F.lit(100.0)).alias("win_sum"),
        )
    )
