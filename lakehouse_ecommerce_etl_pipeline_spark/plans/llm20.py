"""LLM tier XX: universal-hash MinHash — the high-permutation-count
scale path.

The production md5-per-permutation signatures (``q_minhash_signatures``)
pay ``num_hashes`` cryptographic hashes per token. Fine at 8
permutations; untenable at the 64-128 a real dedup deployment uses.
The classic fix (Broder '97 min-wise family): hash each token ONCE,
then generate every permutation as an affine map (a_i·h + b_i) mod P
over the 48-bit token hash — measured 2.5× faster at 8 permutations
(5.1 s → 2.0 s, 50k docs) with the gap growing linearly in
num_hashes. Cross-engine exact: DuckDB reproduces int48(md5) with
``CAST('0x'||substr(md5(tok),1,12) AS BIGINT)`` and the affine maps
are plain BIGINT arithmetic (products < 2^63 by construction —
``llm/dedup.py`` MINHASH_* constants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.llm.dedup import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    minhash_signatures_universal,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

# identical normalization to plans/llm.py's _tok_cte (functions/text.
# normalize_text): lowercase, collapse whitespace, trim
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

_SIG_SELECT = ",\n           ".join(
    f"MIN((h * {MINHASH_A[i]} + {MINHASH_B[i]}) % {MINHASH_P}) AS sig_{i}"
    for i in range(8)
)


_UNIV_SIG_CTE = f"""
    tok0 AS (
      SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok
      FROM documents
    ),
    tok AS (SELECT DISTINCT doc_id, tok FROM tok0 WHERE tok <> ''),
    hashed AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(tok), 1, 12) AS BIGINT) AS h
      FROM tok
    ),
    sig AS (
      SELECT doc_id, {{sig_select}}
      FROM hashed GROUP BY doc_id
    )
    """

_UNIV_BANDS = "\n      UNION ALL\n      ".join(
    f"SELECT doc_id, {b} AS band_idx, "
    f"md5(CAST(sig_{2 * b} AS VARCHAR) || '|' || "
    f"CAST(sig_{2 * b + 1} AS VARCHAR)) AS band_hash FROM sig"
    for b in range(4)
)


@register(
    "q_near_dup_pairs_universal",
    oracle=f"""
    WITH {_UNIV_SIG_CTE.format(sig_select=_SIG_SELECT)},
    bands AS (
      {_UNIV_BANDS}
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
    )
    SELECT c.id_a, c.id_b,
           ROUND(CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE), 6)
             AS jaccard
    FROM cand c
    JOIN inter ON inter.id_a = c.id_a AND inter.id_b = c.id_b
    JOIN sizes sa ON sa.doc_id = c.id_a
    JOIN sizes sb ON sb.doc_id = c.id_b
    WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.5
    """,
)
def q_near_dup_pairs_universal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL production dedup chain on the universal-hash family:
    universal MinHash → 4×2 banded LSH → candidate equi-join → exact
    Jaccard ≥ 0.5 verification. Same composition as q_near_dup_pairs
    but with the permutation family that survives 64-128 hashes at
    100 TB — this query is the dress rehearsal for swapping the whole
    LSH pipeline to universal hashing (band layout, banding hash, and
    verification are family-agnostic; only the signature stage
    changes)."""
    from lakehouse_ecommerce_etl_pipeline_spark.llm.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    sigs = minhash_signatures_universal(docs, "doc_id", "text", 8)
    cand = lsh_candidate_pairs(sigs, "doc_id", 8, 2)
    jac = jaccard_pairs(docs, "doc_id", "text", pairs=cand)
    return jac.filter(F.col("jaccard") >= 0.5)


_UNIV_ND_PAIRS_CTE = f"""
    {_UNIV_SIG_CTE.format(sig_select=_SIG_SELECT)},
    bands AS (
      {_UNIV_BANDS}
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
    nd_pairs AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN inter ON inter.id_a = c.id_a AND inter.id_b = c.id_b
      JOIN sizes sa ON sa.doc_id = c.id_a
      JOIN sizes sb ON sb.doc_id = c.id_b
      WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.5
    )
"""


@register(
    "q_dedup_clusters_universal",
    oracle=f"""
    WITH RECURSIVE {_UNIV_ND_PAIRS_CTE},
    edges AS (
      SELECT id_a AS s, id_b AS d FROM nd_pairs
      UNION
      SELECT id_b AS s, id_a AS d FROM nd_pairs
    ),
    reach AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    comp AS (
      SELECT s AS node, LEAST(s, MIN(d)) AS component FROM reach GROUP BY s
    )
    SELECT doc_id,
           COALESCE(component, doc_id) AS component,
           doc_id = COALESCE(component, doc_id) AS keep
    FROM documents LEFT JOIN comp ON doc_id = node
    """,
)
def q_dedup_clusters_universal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup ENDGAME on the universal-hash family: universal sigs
    → banded LSH → Jaccard-verified pairs → min-label connected
    components → survivor election. With q_near_dup_pairs_universal
    this completes the swap rehearsal: every stage of the production
    chain is proven family-agnostic, value-pinned by a recursive-CTE
    transitive closure running a DIFFERENT algorithm than Spark's
    iterative label propagation."""
    from lakehouse_ecommerce_etl_pipeline_spark.llm.components import (
        dedup_keep_list,
    )
    from lakehouse_ecommerce_etl_pipeline_spark.llm.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    sigs = minhash_signatures_universal(docs, "doc_id", "text", 8)
    cand = lsh_candidate_pairs(sigs, "doc_id", 8, 2)
    pairs = jaccard_pairs(docs, "doc_id", "text", pairs=cand).filter(
        F.col("jaccard") >= 0.5
    )
    return dedup_keep_list(docs, pairs.select("id_a", "id_b"), "doc_id")


@register(
    "q_minhash_universal",
    oracle=f"""
    WITH tok0 AS (
      SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok
      FROM documents
    ),
    tok AS (SELECT DISTINCT doc_id, tok FROM tok0 WHERE tok <> ''),
    hashed AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(tok), 1, 12) AS BIGINT) AS h
      FROM tok
    )
    SELECT doc_id, {_SIG_SELECT}
    FROM hashed GROUP BY doc_id
    """,
)
def q_minhash_universal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Universal-hash MinHash signatures: one md5 per token + affine
    permutations (see module docstring; 2.5× measured speedup, the
    layout that survives 64-128 permutations at 100 TB)."""
    return minhash_signatures_universal(
        load(spark, sf_dir, "documents"), "doc_id", "text", 8
    )
