"""Analytics tier XIX: audience accounting and supervised vector ops.

New shapes over I-XVIII: cumulative distinct users (first-touch
accumulation — running DAU/MAU without re-scanning history), sliding
window distinct counts (trailing-k-day uniques via bounded window
explosion), per-label embedding centroids (the supervised companion
of q_kmeans_clusters, made fully oracle-able by decimal-exact
component sums), and k-nearest-neighbor majority-vote classification
(exact integer-quantized cosine ranking — labels exist on the
embeddings table).

Cross-engine exactness: distinct counts are integers; centroid sums
route float components through DECIMAL(20,8) (associative); k-NN
similarity ranks on dot products of FLOOR(v·1000) integer vectors —
sums of exact integers stay exact in any association, even computed
in doubles, so neighbor order (the thing the prediction depends on)
cannot flip between engines, unlike a raw float cosine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


# ------------------------------------------------- cumulative distincts


@register(
    "q_cumulative_distinct_users",
    oracle="""
    WITH first AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id
    ),
    days AS (
      SELECT first_day AS day, COUNT(*) AS new_users
      FROM first GROUP BY first_day
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
    FROM days
    """,
)
def q_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day via first-touch reduction:
    a user counts once, on their first active day, and the running
    sum of those firsts IS the cumulative distinct count — no
    per-day COUNT(DISTINCT history) rescan.

    100 TB: the naive formulation recomputes an ever-growing distinct
    per day (quadratic in history); this one is a single min-per-user
    aggregate plus a window over one row per day. Incremental loads
    extend it by merging new days' min() — the same partial-merge
    property as q_incremental_agg_merge."""
    first = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("date")).alias("first_day"))
    )
    days = first.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return days.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    )


# ------------------------------------------------- sliding distincts


@register(
    "q_sliding_distinct_users",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    ex AS (
      SELECT ud.day + t.o AS wday, ud.user_id
      FROM ud, unnest([0, 1, 2]) AS t(o)
    )
    SELECT ex.wday AS day, COUNT(DISTINCT ex.user_id) AS trailing3d_users
    FROM ex
    WHERE ex.wday IN (SELECT day FROM ud)
    GROUP BY ex.wday
    """,
)
def q_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-3-day distinct users per active day: each (day, user)
    observation votes into the 3 window-end days it belongs to, then
    one distinct count per window — the standard exact formulation of
    sliding-window uniques (distinct counts don't decompose, so the
    bounded ×k explosion replaces an O(k)-rescan self-join).

    100 TB: blowup is exactly k=3 on the *deduped* (day, user) pairs,
    not raw events; for long windows (MAU=30) switch to the bitmap
    words of q_bitmap_distinct or HLL sketches (q_hll_mergeable) —
    both merge across window days without exploding."""
    ud = (
        load(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("day"), "user_id")
        .distinct()
    )
    ex = ud.select(
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("o"),
        "day",
        "user_id",
    ).select(F.expr("date_add(day, o)").alias("wday"), "user_id")
    active = ud.select("day").distinct()
    return (
        ex.join(active, ex["wday"] == active["day"], "leftsemi")
        .groupBy(F.col("wday").alias("day"))
        .agg(F.count_distinct("user_id").alias("trailing3d_users"))
    )


# ------------------------------------------------- label centroids


@register(
    "q_label_centroids",
    oracle="""
    WITH q AS (
      SELECT label,
             generate_subscripts(embedding, 1) - 1 AS pos,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 16777216)
                  AS BIGINT) AS qv
      FROM embeddings
    )
    SELECT label, CAST(pos AS INTEGER) AS pos,
           CAST(CAST(SUM(qv) AS BIGINT) AS DOUBLE) / 16777216.0 / COUNT(*)
             AS centroid
    FROM q GROUP BY label, pos
    """,
)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding space (supervised class
    means, the labeled companion of q_kmeans_clusters): explode
    components with position, exact-integer mean per (label,
    dimension).  Components quantize via FLOOR(v·2^24) → BIGINT
    (DESIGN §21 rule 3 / the q_feature_moments precedent): the ×2^24
    product is EXACT (power-of-two scaling never rounds a double)
    and FLOOR has no tie to break on any engine build — unlike the
    previous DECIMAL(20,8) cast, whose 8-dp rounding path is
    build-sensitive for raw float components.  int64 sums are
    associative; one /2^24 descale at the end.

    100 TB: one narrow explode (64× rows of 3 small columns — the
    payload array itself never shuffles) and one map-side-combinable
    aggregate over |labels|×64 cells. This is the statistics pass a
    nearest-class-mean classifier or an IVF coarse quantizer
    bootstraps from."""
    q = (
        load(spark, sf_dir, "embeddings")
        .select("label", F.posexplode("embedding").alias("pos", "v"))
        .select(
            "label",
            F.col("pos").cast("int").alias("pos"),
            F.floor(F.col("v").cast("double") * 16777216)
            .cast("bigint")
            .alias("qv"),
        )
    )
    return q.groupBy("label", "pos").agg(
        (
            F.sum("qv").cast("bigint").cast("double")
            / F.lit(16777216.0)
            / F.count(F.lit(1))
        ).alias("centroid")
    )


# ------------------------------------------------- k-NN classification

_KNN_K = 3
_QUANT = "v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000) AS BIGINT)"


@register(
    "q_knn_classify",
    oracle=f"""
    WITH qz AS (
      SELECT vec_id, label,
             list_transform(CAST(embedding AS DOUBLE[]), {_QUANT}) AS z
      FROM embeddings
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id, c.label AS cand_label,
             CAST(list_inner_product(q.z, c.z) AS DOUBLE)
               / sqrt(CAST(list_inner_product(q.z, q.z) AS DOUBLE)
                      * CAST(list_inner_product(c.z, c.z) AS DOUBLE)) AS cos
      FROM qz q JOIN qz c ON q.vec_id < 20 AND c.vec_id >= 20
    ),
    nn AS (
      SELECT query_id, cand_label,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, cand_id) AS rk
      FROM pairs
    ),
    votes AS (
      SELECT query_id, cand_label, COUNT(*) AS n_votes
      FROM nn WHERE rk <= {_KNN_K} GROUP BY query_id, cand_label
    ),
    win AS (
      SELECT query_id, cand_label AS pred_label, n_votes,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY n_votes DESC, cand_label) AS vrk
      FROM votes
    )
    SELECT query_id, pred_label, n_votes FROM win WHERE vrk = 1
    """,
)
def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN (k=3) majority-vote label prediction for the first 20
    vectors against the rest of the corpus: exact cosine ranking over
    integer-quantized embeddings (FLOOR(v·1000)) — integer dot
    products are exact under any summation order, so the neighbor
    ranking (hence the prediction) is engine-stable, which a raw
    float cosine cannot promise near ties. Vote ties break to the
    smallest label.

    100 TB: brute-force scoring is the per-query baseline
    (q_similarity_topk); the scale path routes queries through the
    IVF partitions (q_ann_ivf) or LSH buckets (q_hyperplane_lsh) and
    only scores the candidate shard. The quantization trick is what
    makes distributed re-scoring reproducible across retries."""
    z = F.expr(f"transform(embedding, {_QUANT})").alias("z")
    qz = load(spark, sf_dir, "embeddings").select("vec_id", "label", z)
    q = qz.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("z").alias("qz")
    )
    c = qz.filter(F.col("vec_id") >= 20).select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("cand_label"),
        F.col("z").alias("cz"),
    )
    dot = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (s, x) -> s + x)"
    pairs = q.crossJoin(F.broadcast(c)).select(
        "query_id",
        "cand_id",
        "cand_label",
        (
            F.expr(dot.format(a="qz", b="cz")).cast("double")
            / F.sqrt(
                F.expr(dot.format(a="qz", b="qz")).cast("double")
                * F.expr(dot.format(a="cz", b="cz")).cast("double")
            )
        ).alias("cos"),
    )
    wnn = Window.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    votes = (
        pairs.withColumn("rk", F.row_number().over(wnn))
        .filter(F.col("rk") <= _KNN_K)
        .groupBy("query_id", "cand_label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), "cand_label"
    )
    return (
        votes.withColumn("vrk", F.row_number().over(wv))
        .filter(F.col("vrk") == 1)
        .select("query_id", F.col("cand_label").alias("pred_label"), "n_votes")
    )
