"""LLM tier XIII: Johnson-Lindenstrauss random projection and the
per-source dataset card.

The projection is the cheap dimensionality-reduction step in front of
ANN/clustering (Achlioptas-style ±1 entries preserve pairwise
distances within (1±ε) at k = O(log n / ε²) dims); the dataset card
is the per-source summary sheet (volume, tokens, duplication, quality
mass) a training-mixture decision is actually made from.

Cross-engine exactness: the ±1 projection matrix is a PYTHON-side
md5-derived constant inlined into both engines' expressions, and each
output coordinate is one fixed-shape left-associated sum of doubles —
identical IEEE adds in identical order; card ratios divide exact
integers once."""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.llm import (
    _NORM,
    _NTOK,
    _PUNCT_RE,
    _T,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_IN_DIM = 64
_OUT_DIM = 4


def _proj_sign(j: int, d: int) -> int:
    """Deterministic ±1 matrix entry: parity of md5's first hex digit.
    Computed driver-side once — the matrix is a compile-time constant
    in both engines' expressions, so there is nothing to keep in sync."""
    return 1 if int(hashlib.md5(f"proj:{j}:{d}".encode()).hexdigest()[0], 16) % 2 == 0 else -1


_SIGNS = [
    [_proj_sign(j, d) for d in range(_IN_DIM)] for j in range(_OUT_DIM)
]


def _proj_sql(j: int) -> str:
    terms = []
    for d in range(_IN_DIM):
        sign = "+" if _SIGNS[j][d] > 0 else "-"
        terms.append(f"{sign} CAST(embedding[{d + 1}] AS DOUBLE)")
    # leading sign folds into the first term; division by 2 = sqrt(k) is exact
    return "(" + " ".join(terms) + f") / 2 AS p{j}"


@register(
    "q_random_projection",
    oracle=f"""
    SELECT vec_id, {", ".join(_proj_sql(j) for j in range(_OUT_DIM))}
    FROM embeddings
    """,
)
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random projection: 64-dim embeddings → {_OUT_DIM} dims via a
    deterministic ±1 sign matrix, scaled by 1/√k = 1/2 — the
    Achlioptas normalization that makes E‖y‖² = ‖x‖², and a power of
    two, so the scale is float-exact.  The projected space feeds
    cheap ANN bucketing (q_hyperplane_lsh's hyperplanes are the
    1-bit special case) and visual/cluster diagnostics at a fraction
    of the distance-computation cost.

    100 TB: a stateless per-row projection — no shuffle, no UDF, no
    Python: each output coordinate is a codegen'd chain of 64
    adds/subtracts.  For large k·d, swap the unrolled expression for
    a broadcast matrix + ``F.aggregate`` fold (same semantics, one
    array walk); the unrolled form here is what keeps the fold order
    pinned for the cross-engine hash."""
    emb = load(spark, sf_dir, "embeddings")
    cols = [F.col("vec_id")]
    for j in range(_OUT_DIM):
        acc = None
        for d in range(_IN_DIM):
            term = F.element_at("embedding", d + 1).cast("double")
            signed = term if _SIGNS[j][d] > 0 else -term
            acc = signed if acc is None else acc + signed
        cols.append((acc / 2).alias(f"p{j}"))
    return emb.select(*cols)


@register(
    "q_dataset_card",
    oracle=f"""
    WITH base AS (
      SELECT source,
             {_NTOK} AS n_tokens,
             length(text) AS n_chars,
             md5({_NORM}) AS fp,
             CAST(length(text) BETWEEN 20 AND 100000 AS INTEGER)
           + CAST((CASE WHEN length(text) = 0 THEN 0.0
                ELSE CAST(length(text)
                     - length(regexp_replace(text, '{_PUNCT_RE}', '', 'g'))
                     AS DOUBLE) / CAST(length(text) AS DOUBLE) END) < 0.2
                  AS INTEGER)
           + CAST((CASE WHEN length({_T}) = 0 THEN 0.0
                ELSE CAST(length(replace({_T}, ' ', '')) AS DOUBLE)
                     / CAST({_NTOK} AS DOUBLE) END) BETWEEN 2.0 AND 12.0
                  AS INTEGER) AS q3
      FROM documents
    ),
    fp_counts AS (
      SELECT source, fp, COUNT(*) AS c FROM base GROUP BY source, fp
    ),
    dups AS (
      SELECT source,
             CAST(SUM(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT)
               AS dup_docs
      FROM fp_counts GROUP BY source
    )
    SELECT b.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(b.n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(b.n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(b.n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS avg_chars,
           d.dup_docs,
           CAST(d.dup_docs AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS dup_rate,
           CAST(SUM(b.q3) AS DOUBLE) / CAST(3 * COUNT(*) AS DOUBLE)
             AS avg_quality
    FROM base b JOIN dups d ON d.source = b.source
    GROUP BY b.source, d.dup_docs
    """,
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source dataset card: volume (docs/tokens/chars),
    exact-duplicate mass (docs beyond the first per normalized-text
    fingerprint), and mean quality — the one-page summary a training
    mixture is weighed from (q_source_mixture_sample consumes exactly
    these numbers).  Quality is summed as the INTEGER 0-3 gate count
    per doc and divided once, so the mean is engine-exact where a
    mean of per-doc doubles would depend on reduction order.

    100 TB: two partial-aggregated group-bys (per-(source,
    fingerprint) counts, then per-source rollup) plus one projection
    computing tokens/fingerprint/gates per doc — the corpus is
    scanned once and only |sources|-sized rows move at the end."""
    from lakehouse_ecommerce_etl_pipeline_spark.functions import text as txt

    base = load(spark, sf_dir, "documents").select(
        "source",
        txt.n_tokens("text").cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.md5(txt.normalize_text("text")).alias("fp"),
        # the INTEGER 0-3 gate count (quality_score × 3, but summed as
        # ints — never through the /3.0 double round-trip)
        (
            ((F.length("text") >= 20) & (F.length("text") <= 100000)).cast(
                "int"
            )
            + (txt.punct_ratio("text") < 0.2).cast("int")
            + (
                (txt.avg_token_len("text") >= 2.0)
                & (txt.avg_token_len("text") <= 12.0)
            ).cast("int")
        )
        .cast("bigint")
        .alias("q3"),
    )
    fp_counts = base.groupBy("source", "fp").agg(
        F.count(F.lit(1)).alias("c")
    )
    dups = fp_counts.groupBy("source").agg(
        F.sum(
            F.when(F.col("c") > 1, F.col("c") - 1).otherwise(0)
        )
        .cast("bigint")
        .alias("dup_docs")
    )
    return (
        base.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .join(F.broadcast(dups), "source")
        .join(
            F.broadcast(
                base.groupBy("source").agg(
                    F.sum("q3").cast("bigint").alias("sum_q3")
                )
            ),
            "source",
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "total_chars",
            (
                F.col("total_chars").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("avg_chars"),
            "dup_docs",
            (
                F.col("dup_docs").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("dup_rate"),
            (
                F.col("sum_q3").cast("double")
                / (3 * F.col("n_docs")).cast("double")
            ).alias("avg_quality"),
        )
    )
