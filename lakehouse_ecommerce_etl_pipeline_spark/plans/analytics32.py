"""Analytics tier XXXII: fact-level fuzzy duplicates and reciprocal
neighbors.

q_duplicate_payments finds suspected duplicate transactions — same
customer, same amount band, within a date window, different order
keys — the classic finance-audit heuristic (near-dup detection on
FACTS, complementing the document tier's content dedup).
q_reciprocal_nn mines mutual top-k pairs in the embedding space
(each in the other's top-3 by cosine) — the reciprocal-nearest-
neighbor criterion that seeds agglomerative clustering and
cross-modal matching, far stricter than one-directional kNN.

Cross-engine exactness: duplicate detection decides on integer date
differences and exact double equality of identical stored values;
reciprocal ranking rides the integer-quantized exact cosine
(q_knn_classify discipline) under total tiebreak orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_WINDOW_DAYS = 365
_AMOUNT_BAND = 10_000
_QUANT = "v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000) AS BIGINT)"
_RNN_K = 3


@register(
    "q_duplicate_payments",
    oracle=f"""
    SELECT a.o_orderkey AS key_a, b.o_orderkey AS key_b,
           a.o_custkey,
           a.o_totalprice AS amount_a, b.o_totalprice AS amount_b,
           date_diff('day', a.o_orderdate, b.o_orderdate) AS gap_days
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND floor(a.o_totalprice / {_AMOUNT_BAND})
         = floor(b.o_totalprice / {_AMOUNT_BAND})
     AND a.o_orderkey < b.o_orderkey
     AND b.o_orderdate >= a.o_orderdate
     AND date_diff('day', a.o_orderdate, b.o_orderdate) <= {_WINDOW_DAYS}
    """,
)
def q_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suspected duplicate transactions: pairs of distinct orders by
    the same customer in the same amount band (floor to
    $10000-buckets) within {_WINDOW_DAYS} days — the payments-audit
    screen (double charges, replayed files), banded because exact
    double-equality matches are vanishingly rare in continuous
    amounts. The band test is integer FLOOR equality, the window an
    integer day difference; key orientation keeps one row per pair.

    100 TB: self-join co-partitioned on (custkey, amount) — exact-key
    blocking bounds the blowup by per-block counts (the same blocking
    idea as q_fuzzy_editdist_pairs, with equality instead of edit
    distance); the date window prunes within blocks. Rounded-amount
    or banded variants widen the blocking key when amounts drift by
    cents."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    band = lambda c: F.floor(F.col(c) / _AMOUNT_BAND)  # noqa: E731
    a = o.select(
        F.col("o_orderkey").alias("key_a"),
        "o_custkey",
        F.col("o_totalprice").alias("amount_a"),
        F.col("o_orderdate").alias("date_a"),
    )
    b = o.select(
        F.col("o_orderkey").alias("key_b"),
        F.col("o_custkey").alias("ck_b"),
        F.col("o_totalprice").alias("amount_b"),
        F.col("o_orderdate").alias("date_b"),
    )
    gap = F.datediff("date_b", "date_a")
    return (
        a.join(
            b,
            (F.col("o_custkey") == F.col("ck_b"))
            & (band("amount_a") == band("amount_b"))
            & (F.col("key_a") < F.col("key_b"))
            & (F.col("date_b") >= F.col("date_a"))
            & (gap <= _WINDOW_DAYS),
        )
        .select(
            "key_a",
            "key_b",
            "o_custkey",
            "amount_a",
            "amount_b",
            gap.alias("gap_days"),
        )
    )


@register(
    "q_reciprocal_nn",
    oracle=f"""
    WITH qz AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]), {_QUANT}) AS z
      FROM embeddings WHERE vec_id < 100
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(list_inner_product(a.z, b.z) AS DOUBLE)
               / sqrt(CAST(list_inner_product(a.z, a.z) AS DOUBLE)
                      * CAST(list_inner_product(b.z, b.z) AS DOUBLE)) AS cos
      FROM qz a JOIN qz b ON a.vec_id <> b.vec_id
    ),
    r AS (
      SELECT id_a, id_b, cos,
             ROW_NUMBER() OVER (PARTITION BY id_a
                                ORDER BY cos DESC, id_b) AS rk
      FROM pairs
    ),
    topk AS (SELECT id_a, id_b, cos FROM r WHERE rk <= {_RNN_K})
    SELECT t1.id_a AS vec_a, t1.id_b AS vec_b, t1.cos
    FROM topk t1 JOIN topk t2
      ON t2.id_a = t1.id_b AND t2.id_b = t1.id_a
    WHERE t1.id_a < t1.id_b
    """,
)
def q_reciprocal_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal nearest neighbors over the first 100 embeddings:
    pairs where each vector sits in the OTHER's top-{_RNN_K} by
    cosine — the mutual criterion that kills the hub problem
    one-directional kNN suffers (a hub is everyone's neighbor; it is
    reciprocal with almost no one). Exact integer-quantized cosine
    keeps both directions' rankings engine-stable, and the mutual
    check is a self-join of the top-k list on the swapped pair.

    100 TB: compute directed top-k via the ANN tier (IVF/PQ), then
    the reciprocity check is a self-equi-join on (a,b)=(b,a) — one
    shuffle of k rows per vector. Used as-is to seed RNN-chain
    agglomerative clustering."""
    z = F.expr(f"transform(embedding, {_QUANT})").alias("z")
    qz = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 100)
        .select("vec_id", z)
    )
    a = qz.select(F.col("vec_id").alias("id_a"), F.col("z").alias("za"))
    b = qz.select(F.col("vec_id").alias("id_b"), F.col("z").alias("zb"))
    dot = "aggregate(zip_with({x}, {y}, (p, q) -> p * q), 0L, (s, v) -> s + v)"
    pairs = (
        a.join(F.broadcast(b), F.col("id_a") != F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                F.expr(dot.format(x="za", y="zb")).cast("double")
                / F.sqrt(
                    F.expr(dot.format(x="za", y="za")).cast("double")
                    * F.expr(dot.format(x="zb", y="zb")).cast("double")
                )
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cos"), "id_b")
    topk = pairs.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _RNN_K
    )
    t2 = topk.select(
        F.col("id_a").alias("r_b"), F.col("id_b").alias("r_a")
    )
    return (
        topk.join(
            t2,
            (F.col("id_a") == F.col("r_a")) & (F.col("id_b") == F.col("r_b")),
            "leftsemi",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.col("id_a").alias("vec_a"),
            F.col("id_b").alias("vec_b"),
            "cos",
        )
    )
