"""LLM tier VI: product-quantized embedding search.

q_pq_encode / q_pq_adc_topk register the PQ pipeline (llm/pq.py):
codebooks are trained by iterative k-means (not SQL-expressible →
rows-only for the driver gate); the geometric invariants (code
ranges, ADC ≡ exact distance on reconstructions, better recall than
a degenerate 1-centroid codebook) are pytest-verified in
tests/test_pq.py against pure-Python recomputation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakehouse_ecommerce_etl_pipeline_spark.llm.pq import (
    adc_topk,
    pq_encode,
    train_codebooks,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_M, _K, _ITERS = 4, 8, 3


@register("q_pq_encode")  # rows-only: iterative codebook training
def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-encode the embeddings table: 64-dim float vectors → 4 int
    codes (m=4 subspaces × k=8 centroids)."""
    emb = load(spark, sf_dir, "embeddings")
    cbs = train_codebooks(emb, m=_M, k=_K, iters=_ITERS)
    return pq_encode(emb, cbs)


@register("q_pq_adc_topk")  # rows-only: iterative codebook training
def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-10 for the smallest-id embedding as query: scans only
    the (id, codes) table via per-subspace lookup arrays."""
    emb = load(spark, sf_dir, "embeddings")
    cbs = train_codebooks(emb, m=_M, k=_K, iters=_ITERS)
    codes = pq_encode(emb, cbs)
    query = [
        float(x)
        for x in emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    ]
    return adc_topk(codes, cbs, query, k=10)
