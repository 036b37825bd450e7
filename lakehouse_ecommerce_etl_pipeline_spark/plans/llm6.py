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


@register("q_ivfpq_topk")  # rows-only: iterative coarse+codebook training
def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed IVF+PQ (FAISS IndexIVFPQ shape): coarse cells prune
    the scan, PQ codes over CELL RESIDUALS carry the distances; the
    query probes 2 of 4 cells and ADC-scores only their code rows
    with per-cell lookup tables."""
    from lakehouse_ecommerce_etl_pipeline_spark.llm.pq import (
        ivfpq_index,
        ivfpq_topk,
    )

    emb = load(spark, sf_dir, "embeddings")
    codes, coarse, cbs = ivfpq_index(emb, kc=4, m=_M, k=_K, iters=2)
    query = [
        float(x)
        for x in emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    ]
    return ivfpq_topk(codes, coarse, cbs, query, k=10, n_probe=2)
