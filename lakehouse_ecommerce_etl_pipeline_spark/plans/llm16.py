"""LLM tier XVI: portable SimHash (value-oracled) and bigram
language-model document scoring.

Two additions to the corpus-quality toolchain:

* ``q_simhash_md5`` — the SimHash vote-and-pack path under an
  md5-derived 32-bit token hash that DuckDB reproduces bit-for-bit,
  graduating the SimHash *algorithm* from rows-only (the xxhash64
  production variant, plans/llm.py q_simhash) to a full value oracle.
* ``q_lm_score_docs`` — Laplace-smoothed bigram language-model
  scoring: train corpus bigram/context counts, score every document
  by the sum of its per-bigram smoothed probabilities. This is the
  classic LM-based quality gate (CCNet/KenLM-shaped: rank documents
  by how "corpus-like" their word transitions are) re-expressed with
  integer-exact arithmetic so the float-free score is cross-engine
  reproducible: each probability (c2+1)/(c1+V) is floor-quantized to
  nanounits with BIGINT integer division before the associative sum.

Cross-engine exactness: token hashing is md5-hex→integer (conv vs
CAST '0x…'); LM probabilities never exist as floats — only as
``(10^9 * (c2+1)) div (c1+V)`` BIGINT divisions (Spark ``div`` ≡
DuckDB ``//``, both floor on non-negative operands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.functions.text import normalize_text
from lakehouse_ecommerce_etl_pipeline_spark.llm.dedup import simhash
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

# must mirror llm.dedup.normalize_text (same constant the MinHash /
# Jaccard oracles in plans/llm.py use)
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

_LM_SCALE = 1_000_000_000  # nanounit probability quantization


@register(
    "q_simhash_md5",
    oracle=f"""
    WITH tok0 AS (
      SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok
      FROM documents
    ),
    tok AS (SELECT DISTINCT doc_id, tok FROM tok0 WHERE tok <> ''),
    h AS (
      SELECT doc_id,
             CAST(CONCAT('0x', substring(md5(tok), 1, 8)) AS BIGINT) AS hv
      FROM tok
    ),
    votes AS (
      SELECT doc_id, b.bit,
             SUM(CASE WHEN (hv >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM h CROSS JOIN (SELECT unnest(range(32)) AS bit) b
      GROUP BY doc_id, b.bit
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit)
                         ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
    """,
)
def q_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable SimHash: per-token 32-bit hash from the first 8 md5
    hex digits, ±1 votes per bit over the distinct token set, majority
    packs the fingerprint. Identical vote-and-pack code path to the
    xxhash64 production variant (llm/dedup.py simhash) — this query
    is its cross-engine value witness; q_simhash stays the fast path.

    100 TB: zero shuffles — the whole signature is one codegen'd
    projection (array fold over the in-row token set), embarrassingly
    parallel over input splits; the md5-vs-xxhash64 choice only moves
    per-row CPU, not the plan shape."""
    return simhash(
        load(spark, sf_dir, "documents"), "doc_id", "text", bits=32, portable=True
    )


@register(
    "q_lm_score_docs",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split({_NORM}, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    p AS (
      SELECT doc_id,
             unnest(toks) AS tok,
             unnest(range(1, length(toks) + 1)) AS pos,
             length(toks) AS n
      FROM d
    ),
    bg AS (
      SELECT a.doc_id, a.tok AS w1, a.tok || '|' || b.tok AS big
      FROM p a JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ),
    c2 AS (SELECT big, COUNT(*) AS c2 FROM bg GROUP BY big),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
    v AS (SELECT COUNT(DISTINCT tok) AS v FROM p),
    scored AS (
      SELECT bg.doc_id,
             ({_LM_SCALE} * (c2.c2 + 1)) // (c1.c1 + v.v) AS q
      FROM bg
      JOIN c2 ON c2.big = bg.big
      JOIN c1 ON c1.w1 = bg.w1
      CROSS JOIN v
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(q) AS BIGINT) AS lm_score_q
    FROM scored GROUP BY doc_id
    """,
)
def q_lm_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM document quality scoring: train Laplace-smoothed
    bigram statistics over the whole corpus — C(w1,w2) transition
    counts, C(w1) context counts, vocabulary size V — then score each
    document by the sum of its per-bigram smoothed probabilities
    (c2+1)/(c1+V), floor-quantized to nanounits as BIGINT *before*
    summing so the per-doc score is an associative integer sum (the
    log-free, float-free analogue of a KenLM perplexity filter: low
    lm_score_q per bigram = improbable transitions = noisy text).

    100 TB: the model tables are corpus-*uniqueness*-sized, not
    corpus-sized (distinct bigrams / vocab), built with partial
    aggregation; scoring joins the bigram stream to those count
    tables — broadcastable whenever the trained model fits (the
    common case: a few GB of n-gram counts vs TBs of text), else a
    standard shuffle join on the bigram key; the final per-doc sum is
    map-side combined. V rides along as a broadcast one-row cross
    join, never a collect."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(
            F.split(normalize_text("text"), " "), lambda t: t != ""
        ).alias("toks"),
    )
    n = F.size("toks")
    # adjacent-pair bigrams built array-internally (no positional
    # self-join): zip toks[0..n-2] with toks[1..n-1]
    bg = (
        d.filter(n >= 2)
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice("toks", 1, n - 1),
                    F.slice("toks", 2, n - 1),
                    lambda a, b: F.struct(
                        a.alias("w1"), F.concat(a, F.lit("|"), b).alias("big")
                    ),
                )
            ).alias("z"),
        )
        .select("doc_id", "z.w1", "z.big")
    )
    c2 = bg.groupBy("big").agg(F.count("*").alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = (
        d.select(F.explode("toks").alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    scored = (
        bg.join(c2, "big")
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.expr(f"({_LM_SCALE}L * (c2 + 1)) div (c1 + v)").alias("q"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("q").cast("long").alias("lm_score_q"),
    )
