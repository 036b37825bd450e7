"""LLM tier XIV: embedding-space clusters — the SemDeDup-shaped
endgame for the vector dedup family.

q_embedding_near_dup emits verified cosine-similar PAIRS via the
exact blocked (IVF-cell-pruned) plan; this tier collapses those pairs
into CLUSTERS with the same min-label fixpoint the token-space family
uses (q_near_dup_clusters), so the two dedup modalities end at the
same artifact: one representative per semantic group, keep/drop per
vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.llm.components import (
    connected_components,
)
from lakehouse_ecommerce_etl_pipeline_spark.llm.similarity import (
    cosine_near_dup_pairs_blocked,
    distinct_vector_reps,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_COS_THRESH = 0.35  # testdata max pairwise cosine ≈ 0.51; 0.35 yields a real cluster graph


@register(
    "q_embedding_clusters",
    oracle=f"""
    WITH pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE ROUND(list_cosine_similarity(
              CAST(a.embedding AS DOUBLE[]),
              CAST(b.embedding AS DOUBLE[])), 6) >= {_COS_THRESH}
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach AS (
      WITH RECURSIVE r(node, lbl) AS (
        SELECT vec_id AS node, vec_id AS lbl FROM embeddings
        UNION
        SELECT e.dst, r.lbl FROM edges e JOIN r ON r.node = e.src
      )
      SELECT node, MIN(lbl) AS lbl FROM r GROUP BY node
    )
    SELECT node AS vec_id, lbl AS cluster,
           (node = lbl) AS is_representative
    FROM reach
    """,
)
def q_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-dup clusters: exact cosine ≥
    {_COS_THRESH} pairs from the BLOCKED plan (IVF cells + angular
    triangle-inequality pruning — no CartesianProduct), collapsed by
    min-label propagation run to convergence, every vector seeded
    (no-edge vectors stay singletons), smallest vec_id elected
    representative.  The semantic-dedup decision (SemDeDup-style):
    near-identical meaning, one survivor.

    100 TB: pair mining is the cell-pruned equi-join
    (llm/similarity.py — quadratic only within admissible cell
    pairs); propagation runs on the similarity subgraph, which is a
    small fraction of the corpus; each round localCheckpoints so the
    iterated lineage never compounds.  Downstream keep-list
    application is a broadcast anti-join, exactly as in
    q_corpus_keep_list.

    r4 rep-collapse (the text chain's trick, applied to vectors):
    cosine is a pure function of the vectors, so IDENTICAL embeddings
    form cliques with identical neighborhoods — the pair mine and the
    fixpoint run on one representative per distinct vector (group by
    the array itself; rep = min vec_id) and component labels expand
    back through the rep map, bit-equivalent to the full run.  On a
    replica-heavy corpus this is the difference between quadratic in
    copies and quadratic in distinct vectors: sf1 990 s → seconds.
    Zero-norm vectors are never collapsed (distinct_vector_reps keeps
    each as its own rep): cosine is undefined on them, so duplicate
    zero vectors must stay separate singletons, exactly as the
    uncollapsed pair mine leaves them."""
    emb = load(spark, sf_dir, "embeddings")
    mm, rep_emb = distinct_vector_reps(emb)
    pairs = cosine_near_dup_pairs_blocked(rep_emb, _COS_THRESH).select(
        "id_a", "id_b"
    )
    comp = connected_components(pairs)
    out = mm.join(comp, mm["rep_id"] == comp["node"], "left").select(
        "vec_id",
        F.coalesce(F.col("component"), F.col("rep_id")).alias("cluster"),
    )
    return out.select(
        "vec_id",
        "cluster",
        (F.col("vec_id") == F.col("cluster")).alias("is_representative"),
    )
