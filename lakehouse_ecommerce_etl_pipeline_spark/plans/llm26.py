"""LLM tier XXVI: trained quality-classifier gate (llm/logreg.py).

Two faces, mirroring how production uses a fasttext-style filter:

- TRAINING (q_logreg_train, rows-only): distributed full-batch
  gradient descent over engine-computed text features. Float
  iterative with partition-order partial sums — structurally
  non-SQL-expressible, so it carries the weaker rows-only check and
  the strong pytest instead (exact-parity vs an independent
  single-machine reference, loss monotonicity).
- INFERENCE (q_logreg_score, FULL value oracle): the deployed gate is
  frozen weights + a linear margin + a sign threshold. The margin is
  a fixed-order IEEE multiply-add chain — bit-identical across
  engines — and the sigmoid is monotone so the decision needs no
  transcendentals. This is the part that runs over 100 TB, and it is
  value-pinned exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.functions import text as txt
from lakehouse_ecommerce_etl_pipeline_spark.llm.logreg import (
    score_linear,
    train_logreg,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.llm import _NTOK, _PUNCT_RE, _T
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_COLS = ["x_len", "x_punct", "x_tok"]

# frozen deployment weights: one offline training run of
# train_logreg(lr=2.0, iters=300) on the sf0.001 corpus against the
# short-document gate (n_chars >= 300); w_punct is exactly 0 because
# the synthetic corpus has no punctuation signal. Inference quality:
# acc 0.994, mean log-loss 0.131 on the training corpus.
_W = [-7.4536, 5.8351, 0.0, 10.4848]


def _features(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        (txt.n_chars("text") / F.lit(1000.0)).alias("x_len"),
        txt.punct_ratio("text").alias("x_punct"),
        (txt.n_tokens("text") / F.lit(100.0)).alias("x_tok"),
        (txt.n_chars("text") >= 300).cast("int").alias("y"),
    )


# SQL twins of the feature projections (shared fragments from plans/llm.py)
_X_LEN = "length(text) / 1000.0"
_X_PUNCT = (
    f"CASE WHEN length(text) = 0 THEN 0.0 "
    f"ELSE CAST(length(text) - length(regexp_replace(text, '{_PUNCT_RE}', '', 'g')) AS DOUBLE)"
    f" / CAST(length(text) AS DOUBLE) END"
)
_X_TOK = f"CAST({_NTOK} AS DOUBLE) / 100.0"


@register("q_logreg_train")  # rows-only: float-iterative by design
def q_logreg_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the gate distributedly (60 full-batch GD iterations; per
    iteration one narrow pass + one map-side-combinable gradient
    aggregate; the driver sees k+1 doubles — model-sized, never
    data-sized, same synchronization shape as llm/kmeans.py). Returns
    the learned (feature, weight) rows."""
    feats = _features(load(spark, sf_dir, "documents"))
    w = train_logreg(feats, _COLS, "y", lr=2.0, iters=60)
    return spark.createDataFrame(
        [("bias", float(w[0]))]
        + [(c, float(wi)) for c, wi in zip(_COLS, w[1:])],
        ["feature", "weight"],
    )


@register(
    "q_logreg_score",
    oracle=f"""
    SELECT doc_id,
           {_W[0]} + ({_X_LEN}) * {_W[1]} + ({_X_PUNCT}) * {_W[2]}
                   + ({_X_TOK}) * {_W[3]} AS z,
           ({_W[0]} + ({_X_LEN}) * {_W[1]} + ({_X_PUNCT}) * {_W[2]}
                    + ({_X_TOK}) * {_W[3]}) > 0 AS keep,
           CAST(length(text) >= 300 AS INTEGER) AS y
    FROM documents
    """,
)
def q_logreg_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen-weight gate inference over the corpus: the linear
    margin z (fixed-order multiply-add — cross-engine EXACT, no
    rounding needed) and the keep decision z > 0, next to the true
    label for audit. This is the projection that rides the 100 TB
    scan; training happened once on a sample."""
    feats = _features(load(spark, sf_dir, "documents"))
    return score_linear(feats, _COLS, _W).select("doc_id", "z", "keep", "y")
