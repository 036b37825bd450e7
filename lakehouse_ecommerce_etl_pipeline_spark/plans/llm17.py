"""LLM tier XVII: the corpus-curation pipeline END-TO-END as one
value-oracled query.

Every stage exists as its own oracled query — near-dup clustering
(q_near_dup_clusters), quality-aware survivor election
(q_corpus_keep_list), deterministic splitting (q_split_train_val),
token accounting (q_text_stats) — but a training-data team runs them
as ONE pipeline. ``q_corpus_pipeline_e2e`` chains them: dedup →
survivor election → quality gate → train/val split → the per-(split,
language) dataset card, and the DuckDB oracle replays the *entire
composed chain* (MinHash CTEs through the recursive fixpoint to the
final rollup) so the whole pipeline, not just its pieces, is pinned
value-exact.

100 TB: the chain's cost profile is exactly its parts' — the LSH
pair mine bounds the quadratic stage, the fixpoint runs on the
duplicate subgraph, everything downstream of the keep decision is
scan-local projection + one rollup exchange. Composing the stages
adds NO new shuffle beyond the survivor semi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.llm import (
    _BANDS_UNION,
    _NTOK,
    _PUNCT_RE,
    _SIG_SELECT,
    _T,
    _tok_cte,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_THRESH = 0.5  # must match q_corpus_keep_list / q_near_dup_clusters
_Q_GATE = 0.6  # quality >= 2/3 passes (values are j/3.0)


@register(
    "q_corpus_pipeline_e2e",
    oracle=f"""
    WITH {_tok_cte()},
    sig AS (SELECT doc_id, {_SIG_SELECT} FROM tok GROUP BY doc_id),
    bands AS (
      {_BANDS_UNION}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    dup AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN inter ON inter.id_a = c.id_a AND inter.id_b = c.id_b
      JOIN sizes sa ON sa.doc_id = c.id_a
      JOIN sizes sb ON sb.doc_id = c.id_b
      WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE)
            >= {_THRESH}
    ),
    dup_edges AS (
      SELECT id_a AS src, id_b AS dst FROM dup
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM dup
    ),
    reach AS (
      WITH RECURSIVE r(node, lbl) AS (
        SELECT doc_id AS node, doc_id AS lbl FROM documents
        UNION
        SELECT ed.dst, r.lbl FROM dup_edges ed JOIN r ON r.node = ed.src
      )
      SELECT node, MIN(lbl) AS lbl FROM r GROUP BY node
    ),
    q AS (
      SELECT doc_id,
             CAST(
               CAST(length(text) BETWEEN 20 AND 100000 AS INTEGER)
             + CAST((CASE WHEN length(text) = 0 THEN 0.0
                  ELSE CAST(length(text)
                       - length(regexp_replace(text, '{_PUNCT_RE}', '', 'g'))
                       AS DOUBLE) / CAST(length(text) AS DOUBLE) END) < 0.2
                    AS INTEGER)
             + CAST((CASE WHEN length({_T}) = 0 THEN 0.0
                  ELSE CAST(length(replace({_T}, ' ', '')) AS DOUBLE)
                       / CAST({_NTOK} AS DOUBLE) END) BETWEEN 2.0 AND 12.0
                    AS INTEGER)
               AS DOUBLE) / 3.0 AS quality
      FROM documents
    ),
    survivors AS (
      SELECT r.node AS doc_id, q.quality
      FROM reach r
      JOIN q ON q.doc_id = r.node
      JOIN documents d ON d.doc_id = r.node
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY r.lbl
        ORDER BY q.quality DESC, d.n_chars DESC, r.node) = 1
    ),
    gated AS (
      SELECT s.doc_id, d.lang, d.n_chars, {_NTOK} AS ntok,
             CASE WHEN md5('split:' || CAST(s.doc_id AS VARCHAR)) < '1'
                  THEN 'val' ELSE 'train' END AS split
      FROM survivors s JOIN documents d ON d.doc_id = s.doc_id
      WHERE s.quality >= {_Q_GATE}
    )
    SELECT split, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(ntok) AS BIGINT) AS sum_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS min_id
    FROM gated GROUP BY split, lang
    """,
)
def q_corpus_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole corpus-curation pipeline in one query: near-dup
    clusters → best-quality survivor per cluster (q_corpus_keep_list)
    → quality gate (composite ≥ 2/3) → deterministic md5 train/val
    split → per-(split, language) dataset card (docs, chars,
    whitespace tokens, min id). The oracle replays the ENTIRE chain
    in SQL — MinHash signatures, banded LSH, exact-Jaccard verify,
    recursive min-label fixpoint, survivor window, gate, split,
    rollup — so stage composition itself is value-pinned, not just
    the stages."""
    from lakehouse_ecommerce_etl_pipeline_spark.functions import text as txt
    from lakehouse_ecommerce_etl_pipeline_spark.llm.sampling import (
        deterministic_split,
    )
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics46 import (
        q_corpus_keep_list,
    )

    survivors = (
        q_corpus_keep_list(spark, sf_dir)
        .filter(F.col("keep") & (F.col("quality") >= _Q_GATE))
        .select("doc_id")
    )
    docs = load(spark, sf_dir, "documents")
    gated = docs.join(survivors, "doc_id").select(
        "doc_id", "lang", "n_chars", txt.n_tokens("text").alias("ntok")
    )
    return (
        deterministic_split(gated, "doc_id", threshold_hex="1")
        .groupBy("split", "lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum("ntok").cast("long").alias("sum_tokens"),
            F.min("doc_id").cast("long").alias("min_id"),
        )
    )
