"""LLM tier XII: INCREMENTAL dedup — a new batch probed against the
existing corpus's persisted LSH band index.

Every dedup operator so far (exact, MinHash+LSH, SimHash, embedding)
answers the BATCH question: dedup this corpus against itself.  A
production training-data pipeline mostly answers the incremental one:
a new crawl/batch arrives — which of its documents duplicate what we
ALREADY have?  The scale-correct design persists the corpus's band
index once and equi-joins each arriving batch's bands against it, so
per-batch cost is O(batch), never O(corpus²) and never a corpus
rescan.

Here the split is deterministic (doc_id % 5 == 0 plays the arriving
batch; the rest is the indexed corpus) so the whole chain — index
build, probe, exact-Jaccard verification, per-document keep/drop —
is one oracled query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.llm.dedup import (
    jaccard_pairs,
    lsh_probe_pairs,
    minhash_signatures,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.llm import (
    _BANDS_UNION,
    _NUM_HASHES,
    _ROWS_PER_BAND,
    _SIG_SELECT,
    _tok_cte,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_THRESH = 0.5
_NEW_MOD = 5  # doc_id % 5 == 0 → the arriving batch


@register(
    "q_dedup_incremental",
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
      WHERE a.doc_id % {_NEW_MOD} = 0 AND b.doc_id % {_NEW_MOD} <> 0
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM tok a JOIN tok b ON a.tok = b.tok
      WHERE a.doc_id % {_NEW_MOD} = 0 AND b.doc_id % {_NEW_MOD} <> 0
      GROUP BY a.doc_id, b.doc_id
    ),
    ver AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN inter ON inter.id_a = c.id_a AND inter.id_b = c.id_b
      JOIN sizes sa ON sa.doc_id = c.id_a
      JOIN sizes sb ON sb.doc_id = c.id_b
      WHERE ROUND(CAST(i AS DOUBLE)
                  / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) >= {_THRESH}
    ),
    per_new AS (
      SELECT id_a AS doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_dups,
             MIN(id_b) AS first_match
      FROM ver GROUP BY id_a
    ),
    cands_per_new AS (
      SELECT id_a AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_candidates
      FROM cand GROUP BY id_a
    )
    SELECT d.doc_id,
           COALESCE(c.n_candidates, 0) AS n_candidates,
           COALESCE(p.n_dups, 0) AS n_dups,
           (COALESCE(p.n_dups, 0) > 0) AS is_dup,
           p.first_match
    FROM documents d
    LEFT JOIN cands_per_new c ON c.doc_id = d.doc_id
    LEFT JOIN per_new p ON p.doc_id = d.doc_id
    WHERE d.doc_id % {_NEW_MOD} = 0
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup screening: the arriving batch
    (doc_id % {_NEW_MOD} == 0) is MinHash-signed, banded, and probed
    against the existing corpus's band index; band collisions are
    exact-Jaccard verified (≥ {_THRESH}); each new document gets its
    keep/drop verdict (plus candidate/dup counts and the smallest
    matching corpus id).  New docs that collide with nothing survive
    with zero candidates — the common case the LEFT join preserves.

    100 TB: the corpus band index is built ONCE and persisted (here:
    recomputed because the oracle needs one self-contained query);
    each batch contributes O(batch × bands) probe rows to an
    equi-join against it — never a corpus self-join, never a corpus
    rescan.  Verification joins token arrays only for colliding
    pairs.  This is the operator that turns the batch dedup family
    into a PIPELINE: run per ingest, append survivors, append their
    bands to the index."""
    docs = load(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % _NEW_MOD == 0)
    old = docs.filter(F.col("doc_id") % _NEW_MOD != 0)
    sig_new = minhash_signatures(new, "doc_id", "text", _NUM_HASHES)
    sig_old = minhash_signatures(old, "doc_id", "text", _NUM_HASHES)
    cand = lsh_probe_pairs(
        sig_new, sig_old, "doc_id", _NUM_HASHES, _ROWS_PER_BAND
    )
    ver = jaccard_pairs(docs, "doc_id", "text", pairs=cand).filter(
        F.col("jaccard") >= _THRESH
    )
    per_new = ver.groupBy(F.col("id_a").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dups"),
        F.min("id_b").alias("first_match"),
    )
    cands_per_new = cand.groupBy(F.col("id_a").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    return (
        new.select("doc_id")
        .join(cands_per_new, "doc_id", "left")
        .join(per_new, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
            F.coalesce("n_dups", F.lit(0)).alias("n_dups"),
            (F.coalesce("n_dups", F.lit(0)) > 0).alias("is_dup"),
            "first_match",
        )
    )
