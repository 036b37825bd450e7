"""LLM tier XXXI: BM25 document ranking — the IR scoring face of the
text tier (inverted index + tf-idf salience exist; this adds the
ranking function actual search/retrieval-augmentation stacks run).

Float discipline (the repo's standard): classic BM25's ln-idf is a
transcendental whose last-ulp behavior is not contractually identical
across engines, so the deployed score uses a RATIONAL idf surrogate —
idf_q = (10^6 · (N − df + 1)) div (df + 1), the same monotone-in-df
shape (rare terms score high) as a microunit integer — and the
tf-saturation term is cleared to a common integer denominator:

    k1 = 1.2, b = 0.75
    sat_q = (10^6 · 22·tf·T) div (10·tf·T + 3·T + 9·dl·N)
    score term = idf_q · sat_q                     (avgdl = T/N)

with T = total corpus tokens, dl = doc length — every term BIGINT,
two floor divisions per (doc, term), associative integer sum per
doc. Both factors are quantized BEFORE the product so the magnitudes
stay int64-safe through sf1 and beyond (idf_q ≤ 10^6·N, sat_q ≤
2.2·10^6). An encoder-side change to k1/b moves both engines
together; a divergence in tokenization, df, or the saturation
algebra fails the value oracle digit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_SCALE = 1_000_000
_TOPK = 10
_N_QTERMS = 3  # query = the corpus's 3 most-frequent tokens


@register(
    "q_bm25_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok
      FROM documents
    ),
    tok2 AS (SELECT doc_id, tok FROM tok WHERE tok <> ''),
    tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok2 GROUP BY doc_id, tok
    ),
    dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
      FROM tok2 GROUP BY doc_id
    ),
    df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
    corpus AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(dl) AS BIGINT) AS t
      FROM dl
    ),
    query AS (
      SELECT tok FROM df ORDER BY df DESC, tok LIMIT {_N_QTERMS}
    ),
    scored AS (
      SELECT tf.doc_id,
             (({_SCALE} * (c.n - df.df + 1)) // (df.df + 1))
             * (({_SCALE} * 22 * tf.tf * c.t)
                // (10 * tf.tf * c.t + 3 * c.t + 9 * dl.dl * c.n)) AS s
      FROM tf
      JOIN query q ON q.tok = tf.tok
      JOIN df ON df.tok = tf.tok
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN corpus c
    ),
    perdoc AS (
      SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score_q
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, score_q,
           CAST(ROW_NUMBER() OVER (ORDER BY score_q DESC, doc_id)
                AS BIGINT) AS rnk
    FROM perdoc
    ORDER BY rnk LIMIT {_TOPK}
    """,
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{_TOPK} for the deterministic query (the corpus's
    {_N_QTERMS} most frequent tokens — the worst case for tf-idf,
    where BM25's tf saturation and length normalization are what
    separate documents). Scores are nanounit BIGINTs (see module
    docstring); ties break on doc_id.

    100 TB: tf/dl/df are the inverted-index aggregations (partial-
    combinable, uniqueness-sized); the query term set joins as a
    broadcast ({_N_QTERMS} rows); corpus totals ride a broadcast
    one-row cross join; per-doc sums are map-side combined; the
    closing top-k is TakeOrderedAndProject, never a full sort."""
    from lakehouse_ecommerce_etl_pipeline_spark.llm.dedup import tokens

    docs = load(spark, sf_dir, "documents")
    tk = tokens(docs, "doc_id", "text", distinct=False)
    tf = tk.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    dl = tk.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dl")
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    corpus = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dl").cast("bigint").alias("t"),
    )
    query = df.orderBy(F.col("df").desc(), "tok").limit(_N_QTERMS).select("tok")
    scored = (
        tf.join(F.broadcast(query), "tok")
        .join(df, "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            F.expr(
                f"(({_SCALE}L * (n - df + 1)) div (df + 1))"
                f" * (({_SCALE}L * 22L * tf * t)"
                f" div (10L * tf * t + 3L * t + 9L * dl * n))"
            ).alias("s"),
        )
    )
    perdoc = scored.groupBy("doc_id").agg(
        F.sum("s").cast("bigint").alias("score_q")
    )
    w = Window.orderBy(F.col("score_q").desc(), "doc_id")
    return (
        perdoc.select(
            "doc_id",
            "score_q",
            F.row_number().over(w).cast("bigint").alias("rnk"),
        )
        .filter(F.col("rnk") <= _TOPK)
    )
