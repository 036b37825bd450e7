"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, embarrassingly parallel,
O(n·d) per query; the JVM-side fold (functions/vectors.py) keeps the
hot loop in codegen. The scale path is IVF coarse quantization:
assign every vector to its nearest of k centroids (broadcast join —
centroid set is tiny), store bucketed; a query probes only the
``n_probe`` nearest buckets, pruning ~(1 - n_probe/k) of the data.

100 TB: bucket by centroid id at write time (partitionBy) so a probe
reads only its partitions (partition pruning on the vector table).
Centroids come from a sampled k-means; here a deterministic seed
sample stands in (training loops are out of scope for an engine).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.functions.vectors import cosine, dot, norm


def brute_force_topk(
    vectors: DataFrame,
    query_vec: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k by cosine against a 1-row query DataFrame (column
    ``qvec``). The query side broadcasts; no driver collect. Rounded
    similarity + id tie-break gives deterministic, engine-portable
    ordering."""
    joined = vectors.crossJoin(F.broadcast(query_vec))
    scored = joined.select(
        F.col(id_col),
        F.round(cosine(vec_col, "qvec"), round_to).alias("cosine_sim"),
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col)).limit(k)


def cosine_near_dup_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """All (id_a < id_b) pairs with cosine >= threshold — embedding
    near-dup dedup. Quadratic baseline; at scale run it per-LSH/IVF
    bucket instead of globally (same inner computation)."""
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a", "id_b", F.round(cosine("va", "vb"), round_to).alias("cosine_sim")
    )
    return scored.filter(F.col("cosine_sim") >= threshold)


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (broadcast argmin).
    centroids: (centroid_id, cvec). Adds ``centroid_id``."""
    joined = vectors.crossJoin(F.broadcast(centroids))
    scored = joined.select(
        F.col(id_col),
        F.col(vec_col),
        F.col("centroid_id"),
        cosine(vec_col, "cvec").alias("csim"),
    )
    best = scored.groupBy(id_col).agg(
        F.max(F.struct(F.col("csim"), (-F.col("centroid_id")).alias("neg_cid"))).alias(
            "best"
        )
    )
    return (
        vectors.join(best, id_col)
        .select(
            F.col(id_col), F.col(vec_col), (-F.col("best.neg_cid")).alias("centroid_id")
        )
    )


def seed_centroids(
    vectors: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic stand-in for k-means: the k lowest-id vectors
    become centroids (centroid_id, cvec)."""
    w = vectors.orderBy(id_col).limit(k)
    return w.select(
        F.row_number().over(Window.orderBy(id_col)).alias("centroid_id"),
        F.col(vec_col).alias("cvec"),
    )


def ivf_topk(
    vectors: DataFrame,
    query_vec: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` centroids nearest
    the query, brute-force only inside those buckets."""
    cents = seed_centroids(vectors, n_centroids, id_col, vec_col)
    assigned = ivf_assign(vectors, cents, id_col, vec_col)
    probe = (
        cents.crossJoin(F.broadcast(query_vec))
        .select("centroid_id", cosine("cvec", "qvec").alias("csim"))
        .orderBy(F.col("csim").desc(), F.col("centroid_id"))
        .limit(n_probe)
        .select("centroid_id")
    )
    candidates = assigned.join(F.broadcast(probe), "centroid_id")
    return brute_force_topk(candidates, query_vec, k, id_col, vec_col, round_to)
