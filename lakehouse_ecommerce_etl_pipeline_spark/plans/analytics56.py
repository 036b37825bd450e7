"""Analytics tier LVI: sorted-neighborhood record linkage (SNM).

The third blocking strategy in the entity-resolution family, next to
equality blocking (q_fuzzy_editdist_pairs: same 8-char prefix) and
LSH (the MinHash chain): sort the corpus by a discriminating key and
compare only records within a RANK window of width w — the classic
Hernández/Stolfo sorted-neighborhood method. It catches near-pairs
whose blocking keys differ (a typo in the first character breaks
equality blocking; it usually moves the record only a few positions
in sort order) at O(n·w) comparisons instead of O(n²).

Engine-exact: ranks come from ROW_NUMBER over a TOTAL order (sort
key, then doc_id), the window is integer rank arithmetic, and the
verifier is integer levenshtein — every emitted pair matches the SQL
twin digit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_W = 3  # neighborhood width (ranks ahead to compare against)
_MAXDIST = 10
_TARGET_ROWS = 200  # compaction target rows per output file

_KEY = "substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 16)"


@register(
    "q_compaction_plan",
    oracle=f"""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM orders GROUP BY 1
    )
    SELECT order_month, n_rows,
           CAST((SUM(n_rows) OVER (
                   ORDER BY order_month
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) - n_rows) // {_TARGET_ROWS} AS BIGINT) AS file_id
    FROM m
    """,
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction PLANNING (the OPTIMIZE bin-packing
    decision, separated from its side-effecting execution): month
    partitions of orders are assigned to target output files by
    cumulative row offset — file_id = (rows before this month) div
    target — so consecutive months pack together until the target
    fills, preserving partition order (time locality survives
    compaction, which is what keeps min/max data-skipping effective
    afterwards). Deterministic closed form ⇒ full value oracle; the
    execution side is one `repartition(file_id).write` whose row
    preservation the sink tests already pin.

    100 TB: the plan is computed from partition-level COUNTs — a
    metadata-sized aggregation, never a data scan; the same
    cumulative-offset rule extends to byte sizes when file listings
    carry them."""
    m = (
        load(spark, sf_dir, "orders")
        .groupBy(F.trunc("o_orderdate", "month").alias("order_month"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )
    return m.select(
        "order_month",
        "n_rows",
        F.expr(
            f"(sum(n_rows) OVER (ORDER BY order_month ROWS BETWEEN"
            f" UNBOUNDED PRECEDING AND CURRENT ROW) - n_rows)"
            f" div {_TARGET_ROWS}"
        )
        .cast("bigint")
        .alias("file_id"),
    )


_SNM_PAIRS_CTES = f"""
    r AS (
      SELECT doc_id, lang,
             substr(text, 1, 64) AS pfx,
             ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY {_KEY}, doc_id
             ) AS rn
      FROM documents
    ),
    snm_pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM r a JOIN r b
        ON a.lang = b.lang AND b.rn > a.rn AND b.rn <= a.rn + {_W}
      WHERE levenshtein(a.pfx, b.pfx) <= {_MAXDIST}
    ),
    blk_pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM documents a JOIN documents b
        ON a.lang = b.lang
       AND substr(a.text, 1, 8) = substr(b.text, 1, 8)
       AND a.doc_id < b.doc_id
      WHERE levenshtein(substr(a.text, 1, 64), substr(b.text, 1, 64))
            <= {_MAXDIST}
    ),
    pairs AS (
      SELECT DISTINCT id_a, id_b FROM (
        SELECT * FROM snm_pairs UNION ALL SELECT * FROM blk_pairs
      )
    ),
    er_edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    er_reach AS (
      WITH RECURSIVE rr(node, lbl) AS (
        SELECT doc_id AS node, doc_id AS lbl FROM documents
        UNION
        SELECT e.dst, rr.lbl FROM er_edges e JOIN rr ON rr.node = e.src
      )
      SELECT node, MIN(lbl) AS lbl FROM rr GROUP BY node
    )
"""


@register(
    "q_entity_ids",
    oracle=f"""
    WITH {_SNM_PAIRS_CTES}
    SELECT node AS doc_id, lbl AS entity,
           (node = lbl) AS is_canonical
    FROM er_reach
    """,
)
def q_entity_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end — what the pair miners exist FOR:
    the union of both blocking strategies' verified match pairs
    (sorted-neighborhood + equality-prefix blocking, both bounded
    edit distance) collapsed into entity ids by min-label propagation
    to convergence, every document seeded (non-matching docs stay
    their own entity), smallest doc_id canonical. Two blockers union
    because each catches pairs the other misses — SNM survives
    leading-character typos, prefix blocking survives mid-string
    drift that moves sort rank.

    100 TB: pair mining is the two bounded-blocking plans (O(n·w) and
    per-block self-join); the fixpoint runs on the MATCH subgraph
    only (tiny); per round one join + one min-aggregate with
    localCheckpoint lineage truncation (llm/components.py)."""
    from lakehouse_ecommerce_etl_pipeline_spark.llm.components import (
        connected_components,
    )
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics7 import (
        q_fuzzy_editdist_pairs,
    )

    snm = q_sorted_neighborhood_pairs(spark, sf_dir).select("id_a", "id_b")
    blk = q_fuzzy_editdist_pairs(spark, sf_dir).select("id_a", "id_b")
    pairs = snm.unionByName(blk).distinct()
    cc = connected_components(pairs)
    docs = load(spark, sf_dir, "documents").select("doc_id")
    return (
        docs.join(cc, docs["doc_id"] == cc["node"], "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("entity"),
        )
        .withColumn("is_canonical", F.col("doc_id") == F.col("entity"))
    )


@register(
    "q_sorted_neighborhood_pairs",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, lang,
             substr(text, 1, 64) AS pfx,
             ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY {_KEY}, doc_id
             ) AS rn
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(b.rn - a.rn AS INTEGER) AS rank_gap,
           CAST(levenshtein(a.pfx, b.pfx) AS INTEGER) AS dist
    FROM r a JOIN r b
      ON a.lang = b.lang AND b.rn > a.rn AND b.rn <= a.rn + {_W}
    WHERE levenshtein(a.pfx, b.pfx) <= {_MAXDIST}
    """,
)
def q_sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-pairs from a width-{_W} sorted neighborhood per
    language, verified by bounded edit distance over 64-char
    prefixes. Emits (lower-rank id, higher-rank id, rank gap, dist).

    100 TB plan shape: the sort is per-language ROW_NUMBER (a range
    exchange per partition key — in production you'd sort ONCE and
    reuse the ranked table across window widths); the rank-window
    range join is rewritten as an EQUI-join by exploding each row to
    its {_W} successor ranks, so Spark plans a hash join on
    (lang, rank) instead of a broadcast-nested-loop range join —
    O(n·w) rows cross the exchange, no quadratic term anywhere.
    Comparisons run JVM-side (levenshtein codegen)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.substring("text", 1, 64).alias("pfx"),
        F.substring(
            F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), 1, 16
        ).alias("key"),
    )
    rn = F.row_number().over(
        Window.partitionBy("lang").orderBy("key", "doc_id")
    )
    ranked = d.select("doc_id", "lang", "pfx", rn.alias("rn"))
    # each row targets its next _W ranks -> pure equi-join on (lang, rank)
    probes = ranked.select(
        F.col("doc_id").alias("id_a"),
        F.col("lang").alias("lang_a"),
        F.col("pfx").alias("pfx_a"),
        F.col("rn").alias("rn_a"),
        F.explode(
            F.sequence(F.col("rn") + 1, F.col("rn") + _W)
        ).alias("rn_b"),
    )
    return (
        probes.join(
            ranked.select(
                F.col("doc_id").alias("id_b"),
                F.col("lang").alias("lang_b"),
                F.col("pfx").alias("pfx_b"),
                F.col("rn").alias("rn_b2"),
            ),
            (F.col("lang_a") == F.col("lang_b"))
            & (F.col("rn_b") == F.col("rn_b2")),
        )
        # banded levenshtein (returns -1 past _MAXDIST): identical
        # emitted distances, ~6x fewer DP cells than the full matrix
        .withColumn(
            "dist",
            F.levenshtein("pfx_a", "pfx_b", _MAXDIST).cast("int"),
        )
        .filter(F.col("dist") >= 0)
        .select(
            "id_a",
            "id_b",
            (F.col("rn_b") - F.col("rn_a")).cast("int").alias("rank_gap"),
            "dist",
        )
    )
