"""Analytics tier XVII: scale techniques as first-class oracled queries.

Operators whose POINT is the 100 TB execution strategy, registered
with full value oracles proving the strategy changes nothing about
the answer: salted two-phase aggregation (skew mitigation ≡ plain
group-by because decimal sums are associative), count-min-sketch
heavy hitters (universal integer hashing — (a·k+b) mod p mod w — so
the sketch itself is engine-portable, unlike the engine-specific HLL
in q_hll_mergeable), winsorized robust means, exact-k deterministic
reservoir sampling per group (md5-priority rank), and multimodal
frame sampling (chunk binary payloads into fixed-width frames, hash
every 4th — the video-decode plumbing with a pure-SQL twin).

Reference parity: none of these exist in the reference (SURVEY.md
§2.5/§2.13) — they are the techniques its Glue jobs would need the
day one department or one product dominates a batch (its department-
partitioned products write, glue_jobs/product_etl.py:84, is exactly
the layout that dies on skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


# ------------------------------------------------------- salted aggregate


@register(
    "q_salted_aggregate",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_price,
           COUNT(*) AS n_lines
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_salted_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a 3-value (maximally skewed)
    grouping key: phase 1 groups by (key, salt16) spreading each hot
    key over 16 reducers, phase 2 merges the partials. Because the
    partial sums are decimal (associative) and counts are integers,
    the result is bit-identical to the direct group-by — which is the
    oracle. Salting is a *plan* transformation, not a semantics one.
    Partials ride the BIGINT cents lattice (DESIGN §21 rule 3).

    100 TB: the direct group-by on a 3-value key funnels the whole
    table through 3 reducers; salting caps per-reducer input at
    |table|/(|keys|·16). AQE's skew-join splitting does this for
    joins automatically but NOT for aggregations — salting stays a
    hand technique. Salt from a stable row hash, never rand(): retry
    determinism."""
    salt = F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(16)).alias(
        "salt"
    )
    partial = (
        load(spark, sf_dir, "lineitem")
        .select("l_returnflag", salt, "l_extendedprice")
        .groupBy("l_returnflag", "salt")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
            ).alias("ps"),
            F.count(F.lit(1)).alias("pn"),
        )
    )
    return partial.groupBy("l_returnflag").agg(
        (F.sum("ps").cast("double") / F.lit(100.0)).alias("sum_price"),
        F.sum("pn").alias("n_lines"),
    )


# ------------------------------------------------------- winsorized mean


@register(
    "q_winsorized_mean",
    oracle="""
    WITH b AS (
      SELECT c_mktsegment, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer
    ),
    q AS (
      SELECT c_mktsegment,
             quantile_cont(cents, 0.05) AS p05c,
             quantile_cont(cents, 0.95) AS p95c
      FROM b GROUP BY c_mktsegment
    )
    SELECT b.c_mktsegment,
           (CAST(CAST(SUM(CASE WHEN b.cents > q.p05c AND b.cents < q.p95c
                               THEN b.cents ELSE 0 END) AS BIGINT) AS DOUBLE)
            + SUM(CASE WHEN b.cents <= q.p05c THEN 1 ELSE 0 END) * q.p05c
            + SUM(CASE WHEN b.cents >= q.p95c AND b.cents > q.p05c
                       THEN 1 ELSE 0 END) * q.p95c)
             / 100.0 / COUNT(*) AS winsorized_mean,
           COUNT(*) AS n_customers
    FROM b JOIN q USING (c_mktsegment)
    GROUP BY b.c_mktsegment, q.p05c, q.p95c
    """,
)
def q_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per segment: clamp balances into [p05, p95]
    (exact interpolated percentiles over integer CENTS), then an
    exact mean via the boundary split (DESIGN §21 rule 3): interior
    values sum as exact int64 cents; clamped tails contribute
    count × bound, where the interpolated bound is the same IEEE
    double on both engines — so the whole mean is a handful of
    identical float ops over exact integers.  The estimator-side
    robustness companion to q_median_mad_outliers.

    100 TB: one percentile pass (swap in approx_percentile sketches
    at scale), one broadcast of the 5-row bounds table, one
    map-side-combined aggregate — the clamp never shuffles raw rows."""
    cust = load(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
    )
    q = cust.groupBy("c_mktsegment").agg(
        F.percentile("cents", 0.05).alias("p05c"),
        F.percentile("cents", 0.95).alias("p95c"),
    )
    interior = F.sum(
        F.when(
            (F.col("cents") > F.col("p05c")) & (F.col("cents") < F.col("p95c")),
            F.col("cents"),
        ).otherwise(F.lit(0))
    ).cast("bigint")
    n_lo = F.sum(F.when(F.col("cents") <= F.col("p05c"), 1).otherwise(0))
    # tails are DISJOINT: a value equal to BOTH bounds (degenerate
    # p05 == p95 segment) lands only in n_lo, so the mean collapses to
    # the bound — the clamp-then-mean definition — instead of
    # double-counting (r11 ADVICE item 1)
    n_hi = F.sum(
        F.when(
            (F.col("cents") >= F.col("p95c")) & (F.col("cents") > F.col("p05c")), 1
        ).otherwise(0)
    )
    return (
        cust.join(F.broadcast(q), "c_mktsegment")
        .groupBy("c_mktsegment")
        .agg(
            (
                (
                    interior.cast("double")
                    + n_lo * F.first("p05c")
                    + n_hi * F.first("p95c")
                )
                / F.lit(100.0)
                / F.count(F.lit(1))
            ).alias("winsorized_mean"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


# ------------------------------------------------------- count-min sketch

_CMS_W = 512
_CMS_P = 2147483647  # 2^31 - 1 (Mersenne prime)
_CMS_HASHES = ((1000003, 12345), (999983, 54321), (1000033, 98765))


def _bucket_sql(a: int, b: int, key: str) -> str:
    return f"(({a} * {key} + {b}) % {_CMS_P}) % {_CMS_W}"


@register(
    "q_countmin_heavy_hitters",
    oracle=f"""
    WITH k AS (
      SELECT l_partkey AS key, COUNT(*) AS true_cnt
      FROM lineitem GROUP BY l_partkey
    ),
    b0 AS (SELECT {_bucket_sql(*_CMS_HASHES[0], "key")} AS b,
                  CAST(SUM(true_cnt) AS BIGINT) AS s FROM k GROUP BY 1),
    b1 AS (SELECT {_bucket_sql(*_CMS_HASHES[1], "key")} AS b,
                  CAST(SUM(true_cnt) AS BIGINT) AS s FROM k GROUP BY 1),
    b2 AS (SELECT {_bucket_sql(*_CMS_HASHES[2], "key")} AS b,
                  CAST(SUM(true_cnt) AS BIGINT) AS s FROM k GROUP BY 1)
    SELECT k.key AS l_partkey, k.true_cnt, LEAST(b0.s, b1.s, b2.s) AS cms_est
    FROM k
    JOIN b0 ON b0.b = {_bucket_sql(*_CMS_HASHES[0], "k.key")}
    JOIN b1 ON b1.b = {_bucket_sql(*_CMS_HASHES[1], "k.key")}
    JOIN b2 ON b2.b = {_bucket_sql(*_CMS_HASHES[2], "k.key")}
    ORDER BY cms_est DESC, l_partkey
    LIMIT 20
    """,
)
def q_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters: fold part frequencies into a
    3×512 counter matrix under universal hashing ((a·k+b) mod p mod w
    — pure 64-bit integer arithmetic, so unlike engine HLL sketches
    the whole sketch is reproducible in ANSI SQL and the estimates
    oracle exactly), then report the top-20 keys by upper-bound
    estimate (min over the 3 rows; always ≥ true count).

    100 TB: the sketch is 3·512 integers regardless of key
    cardinality — mergeable across partitions/days by element-wise
    addition, the streaming-friendly complement to the exact
    q_topk/q_freq_items. Estimation error is additive ~N/w; widen w
    for tighter bounds."""
    k = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    est = None
    out = k
    for i, (a, b) in enumerate(_CMS_HASHES):
        bcol = F.expr(_bucket_sql(a, b, "key")).alias("b")
        row = (
            k.select(bcol, "true_cnt")
            .groupBy("b")
            .agg(F.sum("true_cnt").alias(f"s{i}"))
        )
        out = out.withColumn("b", F.expr(_bucket_sql(a, b, "key"))).join(
            F.broadcast(row), "b"
        ).drop("b")
        est = F.col(f"s{i}") if est is None else F.least(est, F.col(f"s{i}"))
    return (
        out.select(
            F.col("key").alias("l_partkey"),
            "true_cnt",
            est.alias("cms_est"),
        )
        .orderBy(F.desc("cms_est"), "l_partkey")
        .limit(20)
    )


# ------------------------------------------------------- reservoir sample


@register(
    "q_reservoir_per_group",
    oracle="""
    WITH r AS (
      SELECT c_mktsegment, c_custkey, c_name,
             row_number() OVER (
               PARTITION BY c_mktsegment
               ORDER BY md5('res:' || CAST(c_custkey AS VARCHAR)), c_custkey)
               AS rk
      FROM customer
    )
    SELECT c_mktsegment, c_custkey, c_name, CAST(rk AS INTEGER) AS rk
    FROM r WHERE rk <= 5
    """,
)
def q_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k (k=5) deterministic sample per segment: every row gets
    a priority md5('res:'||key) and the k smallest priorities win — a
    derandomized reservoir sample that is stable across engines, runs
    and partitionings (the fixed-COUNT complement of the fixed-RATE
    md5-threshold sampling in q_split_train_val / q_stratified_sample).

    100 TB: rank-within-group executes as WindowGroupLimit — each
    partition keeps a 5-row heap, nothing materializes full ranks;
    one shuffle on the group key. For global k over a huge table,
    take per-partition top-k then re-rank the k·partitions survivors."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.md5(F.concat(F.lit("res:"), F.col("c_custkey").cast("string"))),
        "c_custkey",
    )
    return (
        load(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            "c_name",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 5)
    )


# ------------------------------------------------------- frame sampling


@register(
    "q_multimodal_framehash",
    oracle="""
    WITH fr AS (
      SELECT doc_id,
             unnest(range(0, greatest((length(text) + 63) // 64, 1))) AS i,
             text
      FROM documents
    )
    SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
           md5(substr(text, CAST(i * 64 + 1 AS BIGINT), 64)) AS frame_digest
    FROM fr WHERE i % 4 = 0
    """,
)
def q_multimodal_framehash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque media payloads: slice each payload
    into fixed 64-byte frames, keep every 4th (a deterministic
    keyframe-sampling stand-in), and fingerprint each sampled frame —
    the chunk/sample/featurize plumbing of a video pipeline with the
    decode kernel replaced by a hash, which keeps the whole pass
    SQL-expressible and value-oracled (real decoders slot into the
    mapInPandas path, llm/multimodal.py).

    100 TB: explode multiplies rows but each output is 1 frame index +
    1 digest — payload bytes are read once per scan task and never
    shuffled; the sampled-frame table is what downstream dedup/search
    joins on. Frame width and stride are literals so partition
    planning is unaffected."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.expr(
                "explode(sequence(0, greatest((length(text) + 63) div 64, 1) - 1))"
            ).alias("frame_idx"),
            "text",
        )
        .filter(F.col("frame_idx") % 4 == 0)
        .select(
            "doc_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.md5(F.expr("substring(text, frame_idx * 64 + 1, 64)")).alias(
                "frame_digest"
            ),
        )
    )
