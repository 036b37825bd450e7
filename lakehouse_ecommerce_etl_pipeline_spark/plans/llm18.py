"""LLM tier XVIII: measured ANN quality — IVF recall against the
exact ranking, per query and aggregate.

The ANN tier has the exact baseline (q_similarity_topk), the scale
path (q_ann_ivf, q_ivfpq_topk), and the estimate-quality check for
MinHash (q_minhash_estimate_quality) — this closes the loop for the
vector side: recall@k of the IVF index measured against brute force
over a deterministic panel of query vectors. Recall is THE number an
ANN deployment is tuned by (probe count vs recall vs scan fraction),
and measuring it is itself a distributed job at corpus scale.

Registered rows-only (IVF assignment compares float cosines — no
DuckDB twin); tests/test_ann_recall.py pins the structural identity
instead: probing ALL cells makes IVF ≡ exact (recall 1.0 on every
query), and recall is monotone in probe count on the panel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.llm.similarity import (
    ivf_topk_multi,
    topk_multi,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_K = 10
_N_QUERIES = 20


def query_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic query panel: the _N_QUERIES lowest-id vectors,
    broadcast as (qid, qvec)."""
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.orderBy("vec_id")
        .limit(_N_QUERIES)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    )


def ivf_recall(
    spark: SparkSession,
    sf_dir: str,
    n_probe: int = 2,
    n_centroids: int = 8,
) -> DataFrame:
    """(qid, n_hit, recall) — overlap between IVF top-k and exact
    top-k per panel query, plus the per-query recall ratio."""
    emb = load(spark, sf_dir, "embeddings")
    qs = query_panel(spark, sf_dir)
    exact = topk_multi(emb, qs, k=_K).select("qid", "vec_id")
    approx = ivf_topk_multi(
        emb, qs, k=_K, n_centroids=n_centroids, n_probe=n_probe
    ).select("qid", "vec_id")
    hits = exact.join(approx, ["qid", "vec_id"]).groupBy("qid").agg(
        F.count("*").cast("long").alias("n_hit")
    )
    return (
        qs.select("qid")
        .join(hits, "qid", "left")
        .select(
            "qid",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            (F.coalesce("n_hit", F.lit(0)) / F.lit(_K)).alias("recall"),
        )
    )


@register("q_ann_recall")  # rows-only: float IVF assignment, no SQL twin
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall@10 of the IVF index (probe 2 of 8 cells)
    against the exact ranking, over a 20-query deterministic panel.
    Both sides share the multi-query top-k plan (broadcast query
    panel, WindowGroupLimit per-partition pruning); the IVF side
    scans only probed cells — the recall/scan-fraction trade this
    query exists to quantify.

    100 TB: this measurement IS the production tuning job — exact
    top-k over a sampled query panel is affordable (panel x corpus
    with per-partition k-pruning), and the recall table decides
    n_probe before the index serves traffic."""
    return ivf_recall(spark, sf_dir, n_probe=2, n_centroids=8)
