"""LLM tier XXXIII: binary vector quantization + Hamming retrieval.

The third vector-compression face beside PQ (llm/pq.py, 64x via
codebooks) and MRL truncation (q_truncation_recall, fewer dims): keep
ONE SIGN BIT per dimension. A 64-dim float vector becomes 64 bits —
256 bytes -> 8 bytes (32x) — and distance becomes popcount(xor),
which is why binary quantization is the default first-stage filter in
modern vector stores (the re-rank stage then rescoring survivors with
full-precision vectors).

Everything here is integer-exact end to end, so unlike IVF/PQ (float
assignment => rows-only) ALL THREE stages carry full value oracles:

- q_binary_quantize — the codes themselves (sign-bit packing into two
  32-bit words held in BIGINTs; two words, not one, so neither engine
  ever touches the int64 sign bit).
- q_hamming_topk — top-10 per panel query under (hamming, vec_id),
  a total order on integers.
- q_hamming_recall — overlap of the Hamming top-10 against the exact
  rounded-cosine top-10 (the llm18 panel protocol) — the measured
  number that decides whether 1-bit codes are enough for the
  first-stage filter at a given corpus.

Reference parity: the reference (Eugenia-DE/lakehouse-ecommerce-etl-pipeline)
has no vector tier at all — this is north-star extension surface
(BASELINE.json similarity-search family).

100 TB design: packing is a narrow in-row projection (no shuffle, no
UDF — one codegen'd aggregate over the array). The code table is 32x
smaller than the float table and usually memory-resident; the
multi-query scan inherits topk_multi's shape (broadcast panel,
WindowGroupLimit per-partition pruning => shuffled volume is
O(partitions x queries x k)). XOR+popcount over two int64 words is
the cheapest distance kernel there is — the measured recall table is
what justifies serving it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.llm.similarity import topk_multi
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.llm18 import query_panel
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_K = 10
_N_QUERIES = 20


def pack_sign_bits(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(vec_id, code_lo, code_hi): dimension i's sign bit (x > 0) goes
    to bit (i mod 32) of word (i div 32). Each word stays < 2^32 so
    the packing is sign-safe in int64 on every engine. Pure in-row
    JVM expression — one whole-stage-codegen projection, no UDF."""

    def word(offset: int):
        return F.expr(
            f"aggregate(transform(slice({vec_col}, {offset + 1}, 32), "
            "(x, i) -> IF(CAST(x AS DOUBLE) > 0D, shiftleft(1L, i), 0L)), "
            "0L, (a, b) -> a + b)"
        )

    return df.select(
        "vec_id",
        word(0).alias("code_lo"),
        word(32).alias("code_hi"),
    )


# DuckDB twin of pack_sign_bits (lambda index i is 1-based there)
def _codes_cte(table: str = "embeddings") -> str:
    def word(lo: int, hi: int) -> str:
        return (
            f"CAST(list_sum(list_transform(embedding[{lo}:{hi}], (x, i) -> "
            "CASE WHEN CAST(x AS DOUBLE) > 0 THEN (1::BIGINT << (i - 1)) "
            "ELSE 0::BIGINT END)) AS BIGINT)"
        )

    return (
        f"SELECT vec_id, {word(1, 32)} AS code_lo, {word(33, 64)} AS code_hi "
        f"FROM {table}"
    )


@register(
    "q_binary_quantize",
    oracle=f"""
    WITH codes AS ({_codes_cte()})
    SELECT vec_id, code_lo, code_hi,
           CAST(bit_count(code_lo) + bit_count(code_hi) AS INTEGER) AS n_pos
    FROM codes
    """,
)
def q_binary_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit codes for every embedding: 64 dims -> two 32-bit words
    (32x compression), plus the positive-dimension count as a packing
    witness (an off-by-one in bit placement OR a wrong threshold flips
    it). Full value oracle — the float->bit threshold (x > 0) is a
    sign test, identical IEEE semantics in both engines."""
    emb = load(spark, sf_dir, "embeddings")
    return pack_sign_bits(emb).select(
        "vec_id",
        "code_lo",
        "code_hi",
        F.expr("bit_count(code_lo) + bit_count(code_hi)")
        .cast("int")
        .alias("n_pos"),
    )


_HAMMING_BASE = f"""
    WITH codes AS ({_codes_cte()}),
    q AS (
      SELECT vec_id AS qid, code_lo AS q_lo, code_hi AS q_hi
      FROM codes ORDER BY qid LIMIT {_N_QUERIES}
    ),
    scored AS (
      SELECT q.qid, c.vec_id,
             CAST(bit_count(xor(c.code_lo, q.q_lo))
                  + bit_count(xor(c.code_hi, q.q_hi)) AS INTEGER) AS hamming
      FROM codes c, q WHERE c.vec_id <> q.qid
    ),
    ranked AS (
      SELECT qid, vec_id, hamming,
             ROW_NUMBER() OVER (
               PARTITION BY qid ORDER BY hamming, vec_id
             ) AS rnk
      FROM scored
    ),
    ham_top AS (
      SELECT qid, CAST(rnk AS INTEGER) AS rnk, vec_id, hamming
      FROM ranked WHERE rnk <= {_K}
    )
"""


def _hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = pack_sign_bits(load(spark, sf_dir, "embeddings"))
    qs = (
        codes.orderBy("vec_id")
        .limit(_N_QUERIES)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("code_lo").alias("q_lo"),
            F.col("code_hi").alias("q_hi"),
        )
    )
    scored = (
        codes.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.expr(
                "bit_count(code_lo ^ q_lo) + bit_count(code_hi ^ q_hi)"
            )
            .cast("int")
            .alias("hamming"),
        )
    )
    w = Window.partitionBy("qid").orderBy("hamming", "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= _K)
    )


@register(
    "q_hamming_topk",
    oracle=_HAMMING_BASE + "SELECT qid, rnk, vec_id, hamming FROM ham_top",
)
def q_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} per panel query by Hamming distance over the sign-bit
    codes — the first-stage filter a binary-quantized vector store
    serves. (hamming ASC, vec_id ASC) is a total order on integers,
    so ranks are engine-exact => full value oracle.

    100 TB: the scan reads ONLY the 16-byte code table; per-partition
    WindowGroupLimit keeps k rows per query before the exchange."""
    return _hamming_topk(spark, sf_dir).select(
        "qid", "rnk", "vec_id", "hamming"
    )


@register(
    "q_hamming_recall",
    oracle=_HAMMING_BASE
    + f""",
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    eq AS (
      SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
      FROM embeddings ORDER BY qid LIMIT {_N_QUERIES}
    ),
    cos_scored AS (
      SELECT eq.qid, e.vec_id,
             ROUND(list_cosine_similarity(e.v, eq.qvec), 6) AS cs
      FROM e, eq WHERE e.vec_id <> eq.qid
    ),
    cos_ranked AS (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (
               PARTITION BY qid ORDER BY cs DESC, vec_id
             ) AS rnk
      FROM cos_scored
    ),
    exact AS (SELECT qid, vec_id FROM cos_ranked WHERE rnk <= {_K})
    SELECT h.qid, CAST(COUNT(x.vec_id) AS BIGINT) AS n_hit,
           CAST(COUNT(x.vec_id) AS DOUBLE) / {_K} AS recall
    FROM ham_top h LEFT JOIN exact x
      ON x.qid = h.qid AND x.vec_id = h.vec_id
    GROUP BY h.qid
    """,
)
def q_hamming_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{k} of the 1-bit Hamming ranking against the exact
    rounded-cosine ranking over the 20-query panel — the number that
    decides whether sign-bit codes can serve as the first-stage
    filter (and how deep the full-precision re-rank pool must be).
    Both rankings are total orders (integers; rounded cosine with id
    tie-break), so unlike IVF recall (rows-only) this panel is fully
    value-oracled."""
    emb = load(spark, sf_dir, "embeddings")
    qs = query_panel(spark, sf_dir)
    exact = topk_multi(emb, qs, k=_K).select(
        F.col("qid").alias("e_qid"), F.col("vec_id").alias("hit_id")
    )
    ham = _hamming_topk(spark, sf_dir).select("qid", "vec_id")
    return (
        ham.join(
            exact,
            (F.col("qid") == F.col("e_qid"))
            & (F.col("vec_id") == F.col("hit_id")),
            "left",
        )
        .groupBy("qid")
        .agg(F.count("hit_id").cast("long").alias("n_hit"))
        .select("qid", "n_hit", (F.col("n_hit") / F.lit(_K)).alias("recall"))
    )
