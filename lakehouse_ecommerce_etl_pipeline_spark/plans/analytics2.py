"""Analytical tier II: join matrix, as-of/range joins, percentiles,
sliding windows, unpivot, scalar-function batteries — rounding out the
extension surface (SURVEY.md §2.4/§2.6/§2.9 extension rows).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.operators.aggregates import dsum, sql_dsum
from lakehouse_ecommerce_etl_pipeline_spark.operators.joins import asof_join
from lakehouse_ecommerce_etl_pipeline_spark.operators.setops import intersect_distinct
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


# ------------------------------------------------------- join matrix

@register(
    "q_join_left",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name
    FROM orders o
    LEFT JOIN (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000) c
      ON o.o_custkey = c.c_custkey
    """,
)
def q_join_left(spark, sf_dir):
    """LEFT OUTER with a filtered dim — unmatched orders keep NULL
    dim columns; dim side broadcasts."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey", "c_name")
    )
    return o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey, "left"
    ).select("o_orderkey", "o_custkey", "c_name")


@register(
    "q_join_full",
    oracle="""
    SELECT a.o_custkey AS cust_a, b.o_custkey AS cust_b, a.n_o, b.n_f
    FROM (SELECT o_custkey, COUNT(*) AS n_o FROM orders
          WHERE o_orderstatus = 'O' GROUP BY o_custkey) a
    FULL OUTER JOIN
         (SELECT o_custkey, COUNT(*) AS n_f FROM orders
          WHERE o_orderstatus = 'F' GROUP BY o_custkey) b
      ON a.o_custkey = b.o_custkey
    """,
)
def q_join_full(spark, sf_dir):
    """FULL OUTER — customers with only-open or only-finished orders
    surface NULLs on the respective side."""
    o = load(spark, sf_dir, "orders")
    a = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_o"))
        .withColumnRenamed("o_custkey", "cust_a")
    )
    b = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_f"))
        .withColumnRenamed("o_custkey", "cust_b")
    )
    return a.join(b, a.cust_a == b.cust_b, "full").select(
        "cust_a", "cust_b", "n_o", "n_f"
    )


@register(
    "q_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_intersect(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return intersect_distinct(
        o.filter(F.col("o_orderstatus") == "O").select("o_custkey"),
        o.filter(F.col("o_orderstatus") == "F").select("o_custkey"),
    )


# ----------------------------------------------- as-of / range joins

@register(
    "q_asof_join",
    oracle="""
    WITH clicks AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, ts,
             MAX(value) AS purchase_value        -- unique per (user, ts)
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT c.user_id, c.event_id, c.ts, p.purchase_value AS purchase_value_asof
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def q_asof_join(spark, sf_dir):
    """Backward as-of join (operator Spark lacks): latest purchase
    value at-or-before each click, per user. Union+window composition
    (operators/joins.asof_join); oracle is DuckDB's native ASOF JOIN —
    two independent implementations, same semantics."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    return asof_join(
        clicks, purchases, "user_id", "ts", "ts", ["purchase_value"]
    )


@register(
    "q_asof_join_pandas",
    oracle="""
    WITH clicks AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, ts,
             MAX(value) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT c.user_id, c.event_id, c.ts, p.purchase_value AS purchase_value_asof
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def q_asof_join_pandas(spark, sf_dir):
    """The as-of join's SECOND physical strategy: cogrouped
    ``pd.merge_asof`` per key (Arrow both ways). Same oracle as
    q_asof_join — three implementations (union+window, merge_asof,
    DuckDB native ASOF) must all agree."""
    from lakehouse_ecommerce_etl_pipeline_spark.operators.joins import (
        asof_join_pandas,
    )

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    return asof_join_pandas(
        clicks, purchases, "user_id", "ts", "ts", ["purchase_value"]
    )


@register(
    "q_range_join",
    oracle="""
    WITH months AS (
      SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS m
      FROM orders
    )
    SELECT o.o_orderkey, m.m AS order_month
    FROM orders o JOIN months m
      ON o.o_orderdate >= m.m
     AND o.o_orderdate < m.m + INTERVAL 1 MONTH
    """,
)
def q_range_join(spark, sf_dir):
    """Range join rewritten as bucketed equi-join — the scale pattern:
    instead of an O(n·m) range-predicate join (what the oracle runs),
    truncate the probe key to the bucket and equi-join. Identical
    results because buckets tile the range."""
    o = load(spark, sf_dir, "orders")
    months = (
        o.select(F.trunc("o_orderdate", "month").alias("m")).distinct()
    )
    bucketed = o.withColumn("m", F.trunc("o_orderdate", "month"))
    return bucketed.join(F.broadcast(months), "m").select(
        "o_orderkey", F.col("m").alias("order_month")
    )


# ------------------------------------------------------- percentiles

@register(
    "q_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.50) AS p50,
           quantile_cont(l_quantity, 0.95) AS p95
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentile(spark, sf_dir):
    """Exact interpolated percentiles (ANSI percentile_cont semantics
    on both engines). The 100 TB path is approx_percentile (one-pass
    mergeable sketch, q_percentile_approx)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("p25"),
        F.percentile("l_quantity", 0.50).alias("p50"),
        F.percentile("l_quantity", 0.95).alias("p95"),
    )


@register(
    "q_percentile_approx",
    oracle="""
    SELECT l_returnflag,
           CAST(quantile_disc(l_quantity, 0.5) AS BIGINT) AS p50_exact_disc,
           TRUE AS within_rank_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentile_approx(spark, sf_dir):
    """GK-style approximate percentile — single pass, mergeable, the
    scale path for quantiles. Value-oracled as a RANK-ERROR CONTRACT
    (the sketch's pick is engine-specific; its hard guarantee is
    not): percentile_approx(accuracy=1000) promises an element whose
    rank is within n/1000 of the target, so the query checks that the
    returned value's rank interval [#{< v} + 1, #{≤ v}] intersects
    [⌈n/2⌉ − n/1000 − 1, ⌈n/2⌉ + n/1000 + 1] — pure integer
    arithmetic — and emits the exact discrete median beside the
    boolean; the oracle asserts exact + TRUE."""
    li = load(spark, sf_dir, "lineitem")
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.5, 1000).alias("v")
    )
    ranks = li.join(F.broadcast(approx), "l_returnflag").groupBy(
        "l_returnflag"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("l_quantity") < F.col("v")).cast("long")).alias("lt"),
        F.sum((F.col("l_quantity") <= F.col("v")).cast("long")).alias("le"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)")
        .cast("bigint")
        .alias("p50_exact_disc")
    )
    n = F.col("n")
    target = F.ceil(n / 2)
    err = F.floor(n / 1000) + 1
    ok = (F.col("lt") + 1 <= target + err) & (F.col("le") >= target - err)
    return ranks.join(exact, "l_returnflag").select(
        "l_returnflag", "p50_exact_disc", ok.alias("within_rank_bound")
    )


# ------------------------------------------------- sliding windows

@register(
    "q_sliding_window_agg",
    oracle="""
    WITH starts AS (
      SELECT date_trunc('hour', ts) AS ws, value FROM events
      UNION ALL
      SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws, value FROM events
    )
    SELECT ws AS window_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_value
    FROM starts GROUP BY ws
    """,
)
def q_sliding_window_agg(spark, sf_dir):
    """Sliding window (2 h width, 1 h slide): every event lands in two
    windows — Spark's window() expansion, oracled by the explicit
    two-bucket union."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


# ---------------------------------------------------------- unpivot

@register(
    "q_unpivot",
    oracle="""
    SELECT l_returnflag, 'O' AS linestatus,
           COUNT(*) FILTER (WHERE l_linestatus = 'O') AS n
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT l_returnflag, 'F' AS linestatus,
           COUNT(*) FILTER (WHERE l_linestatus = 'F') AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_unpivot(spark, sf_dir):
    """Pivot → stack round-trip (unpivot via stack)."""
    piv = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.count(F.lit(1)))
        .select(
            "l_returnflag",
            F.coalesce(F.col("O"), F.lit(0)).alias("o_cnt"),
            F.coalesce(F.col("F"), F.lit(0)).alias("f_cnt"),
        )
    )
    return piv.selectExpr(
        "l_returnflag",
        "stack(2, 'O', o_cnt, 'F', f_cnt) AS (linestatus, n)",
    )


# -------------------------------------------------- scalar batteries

@register(
    "q_math_fns",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice, 1) AS rounded,
           abs(o_totalprice - 100000.0) AS abs_diff,
           CAST(floor(o_totalprice) AS BIGINT) AS floored,
           CAST(ceil(o_totalprice) AS BIGINT) AS ceiled,
           sqrt(o_totalprice) AS sqrt_price
    FROM orders
    """,
)
def q_math_fns(spark, sf_dir):
    """Math scalar battery (round/abs/floor/ceil/sqrt — all
    IEEE-deterministic and engine-portable)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round("o_totalprice", 1).alias("rounded"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("abs_diff"),
        F.floor("o_totalprice").alias("floored"),
        F.ceil("o_totalprice").alias("ceiled"),
        F.sqrt("o_totalprice").alias("sqrt_price"),
    )


@register(
    "q_string_fns",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up,
           substr(p_name, 1, 3) AS pre,
           concat(p_brand, ':', p_type) AS tagged,
           length(p_name) AS name_len,
           replace(p_name, ' ', '_') AS snake
    FROM part
    """,
)
def q_string_fns(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.substring("p_name", 1, 3).alias("pre"),
        F.concat_ws(":", "p_brand", "p_type").alias("tagged"),
        F.length("p_name").alias("name_len"),
        F.replace("p_name", F.lit(" "), F.lit("_")).alias("snake"),
    )


@register(
    "q_conditional_fns",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 150000 THEN 'big'
                WHEN o_totalprice > 50000 THEN 'mid'
                ELSE 'small' END AS bucket,
           coalesce(nullif(o_orderstatus, 'P'), 'pending') AS status_norm,
           least(o_totalprice, 100000.0) AS capped,
           greatest(o_totalprice, 1000.0) AS floored_price
    FROM orders
    """,
)
def q_conditional_fns(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 150000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("pending")).alias(
            "status_norm"
        ),
        F.least("o_totalprice", F.lit(100000.0)).alias("capped"),
        F.greatest("o_totalprice", F.lit(1000.0)).alias("floored_price"),
    )


# --------------------------------------------------------- explode

@register(
    "q_tokenize_explode",
    oracle="""
    WITH tok0 AS (
      SELECT doc_id,
             unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tok
      FROM documents
    ),
    tok AS (SELECT DISTINCT doc_id, tok FROM tok0 WHERE tok <> '')
    SELECT tok, COUNT(*) AS n_docs FROM tok GROUP BY tok
    """,
)
def q_tokenize_explode(spark, sf_dir):
    """explode/unnest + document-frequency aggregation — the inverted-
    index building block."""
    from lakehouse_ecommerce_etl_pipeline_spark.llm.dedup import tokens

    docs = load(spark, sf_dir, "documents")
    return tokens(docs, "doc_id", "text").groupBy("tok").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


# --------------------------------------------------- vector scalars

@register(
    "q_vector_norms",
    oracle="""
    SELECT vec_id, len(embedding) AS dim,
           ROUND(sqrt(list_inner_product(
             CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 6)
             AS l2_norm
    FROM embeddings
    """,
)
def q_vector_norms(spark, sf_dir):
    """Per-vector L2 norm + dimensionality via JVM-side fold."""
    from lakehouse_ecommerce_etl_pipeline_spark.functions.vectors import norm

    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(norm("embedding"), 6).alias("l2_norm"),
    )
