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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.llm.dedup import (
    jaccard_pairs,
    lsh_probe_pairs,
    minhash_signatures_universal,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load, load_parallel, work_dir
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
    bands to the index.

    r4 rep-collapse on BOTH sides: signatures/bands/Jaccard are pure
    functions of the token set, so probing and verification run once
    per distinct (batch-rep, corpus-rep) pair, and the per-document
    counts expand arithmetically — n_candidates/n_dups are Σ of the
    colliding/verified corpus-groups' sizes, first_match is the min
    verified corpus rep (= its group's min id).  Identical output,
    but the verify volume is distinct-text-quadratic instead of
    duplicate-quadratic (sf1: 755 s → seconds)."""
    from lakehouse_ecommerce_etl_pipeline_spark.llm.components import (
        token_set_reps,
    )

    docs = load_parallel(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % _NEW_MOD == 0)
    old = docs.filter(F.col("doc_id") % _NEW_MOD != 0)
    new_m = token_set_reps(new, "doc_id", "text")
    old_m = token_set_reps(old, "doc_id", "text")
    gs_old = old_m.groupBy("rep_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("gsz")
    )
    new_reps = (
        new.join(new_m, "doc_id")
        .filter(F.col("doc_id") == F.col("rep_id"))
        .select("doc_id", "text")
    )
    old_reps = (
        old.join(old_m, "doc_id")
        .filter(F.col("doc_id") == F.col("rep_id"))
        .select("doc_id", "text")
    )
    sig_new = minhash_signatures_universal(new_reps, "doc_id", "text", _NUM_HASHES)
    sig_old = minhash_signatures_universal(old_reps, "doc_id", "text", _NUM_HASHES)
    cand = lsh_probe_pairs(
        sig_new, sig_old, "doc_id", _NUM_HASHES, _ROWS_PER_BAND
    )
    ver = jaccard_pairs(docs, "doc_id", "text", pairs=cand).filter(
        F.col("jaccard") >= _THRESH
    )
    per_brep_cand = (
        cand.join(gs_old, cand["id_b"] == gs_old["rep_id"])
        .groupBy("id_a")
        .agg(F.sum("gsz").cast("bigint").alias("n_candidates"))
    )
    per_brep_ver = (
        ver.join(gs_old, ver["id_b"] == gs_old["rep_id"])
        .groupBy("id_a")
        .agg(
            F.sum("gsz").cast("bigint").alias("n_dups"),
            F.min("id_b").alias("first_match"),
        )
    )
    return (
        new_m.join(
            per_brep_cand, new_m["rep_id"] == per_brep_cand["id_a"], "left"
        )
        .drop("id_a")
        .join(per_brep_ver, new_m["rep_id"] == per_brep_ver["id_a"], "left")
        .select(
            "doc_id",
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
            F.coalesce("n_dups", F.lit(0)).alias("n_dups"),
            (F.coalesce("n_dups", F.lit(0)) > 0).alias("is_dup"),
            "first_match",
        )
    )


_B = 3  # deterministic arrival batches: doc_id % 3


@register(
    "q_stream_incremental_dedup",
    oracle=f"""
    WITH {_tok_cte()},
    sig AS (SELECT doc_id, {_SIG_SELECT} FROM tok GROUP BY doc_id),
    bands AS (
      {_BANDS_UNION}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
    cross_cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
      WHERE a.doc_id % {_B} > b.doc_id % {_B}
    ),
    ver AS (
      SELECT c.id_a, c.id_b
      FROM cross_cand c
      JOIN (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
        FROM tok a JOIN tok b ON a.tok = b.tok
        WHERE a.doc_id % {_B} > b.doc_id % {_B}
        GROUP BY a.doc_id, b.doc_id
      ) inter ON inter.id_a = c.id_a AND inter.id_b = c.id_b
      JOIN sizes sa ON sa.doc_id = c.id_a
      JOIN sizes sb ON sb.doc_id = c.id_b
      WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE)
            >= {_THRESH}
    ),
    s0 AS (SELECT doc_id FROM documents WHERE doc_id % {_B} = 0),
    s1 AS (
      SELECT doc_id FROM documents d WHERE doc_id % {_B} = 1
      AND NOT EXISTS (
        SELECT 1 FROM ver v JOIN s0 ON s0.doc_id = v.id_b
        WHERE v.id_a = d.doc_id
      )
    ),
    s2 AS (
      SELECT doc_id FROM documents d WHERE doc_id % {_B} = 2
      AND NOT EXISTS (
        SELECT 1 FROM ver v
        WHERE v.id_a = d.doc_id
          AND (v.id_b IN (SELECT doc_id FROM s0)
               OR v.id_b IN (SELECT doc_id FROM s1))
      )
    )
    SELECT doc_id, CAST(0 AS INT) AS arrival_batch FROM s0
    UNION ALL
    SELECT doc_id, CAST(1 AS INT) AS arrival_batch FROM s1
    UNION ALL
    SELECT doc_id, CAST(2 AS INT) AS arrival_batch FROM s2
    """,
)
def q_stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental dedup run as a REAL Structured Streaming
    pipeline (streaming/incremental_dedup.py): the corpus arrives as
    {_B} files (arrival batch = doc_id % {_B}, staged with strictly
    increasing mtimes so the file source's order is pinned), each
    micro-batch is screened against the persisted survivor band index
    built by the batches before it, and survivors are appended.  The
    oracle unrolls the same sequential semantics batch-by-batch in
    SQL (survivors of batch k = docs with no LSH-verified near-dup
    among survivors of batches < k) — a FULL value oracle for a
    stateful streaming pipeline, which works because arrival order is
    deterministic and per-batch decisions depend only on prior
    survivor state.

    100 TB: the checkpoint holds only source-discovery state; dedup
    state is two append-only parquet tables that grow with survivors
    — per-batch cost is the batch-vs-index band equi-join, never a
    corpus rescan (see module docstring)."""
    import uuid

    from lakehouse_ecommerce_etl_pipeline_spark.streaming.incremental_dedup import (
        run_incremental_dedup,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    base = work_dir(sf_dir, "stream_inc_dedup")
    run_id = uuid.uuid4().hex[:8]
    raw = os.path.join(base, run_id, "raw")
    state = os.path.join(base, run_id, "state")
    ckpt = os.path.join(base, run_id, "ckpt")
    os.makedirs(raw, exist_ok=True)
    for b in range(_B):
        stage = os.path.join(base, run_id, f"stage_{b}")
        docs.filter(F.col("doc_id") % _B == b).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = next(
            p for p in os.listdir(stage) if p.endswith(".parquet")
        )
        dst = os.path.join(raw, f"batch_{b}.parquet")
        os.rename(os.path.join(stage, part), dst)
        # pin arrival order for the file source (sorts by mtime)
        os.utime(dst, (1000 * (b + 1), 1000 * (b + 1)))
    run_incremental_dedup(
        spark, raw, state, ckpt, docs.schema, max_files_per_trigger=1
    )
    surv = spark.read.parquet(os.path.join(state, "survivors"))
    return surv.select(
        "doc_id", (F.col("doc_id") % _B).cast("int").alias("arrival_batch")
    )
