"""Analytics tier XVIII: tokenizer-grade text counting, bitmap
distincts, and grouping metadata.

Cross-engine exactness: the BPE-ish token regex uses only explicit
ASCII classes (`[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]`) — Java regex (Spark)
and RE2 (DuckDB) agree on those, where shorthand classes like \\s
differ in corner cases (Java \\s includes vertical tab, RE2's does
not). The bitmap distinct is pure 64-bit integer algebra; its oracle
is the semantically-equal COUNT(DISTINCT). grouping_id is
reconstructed in DuckDB as GROUPING(a)*2+GROUPING(b) (same bit order
as Spark's grouping_id()).

Reference parity: token counting is the LLM-tier budget primitive
(BASELINE.json north star: "token counting (whitespace + a BPE-ish
regex)"); bitmap distincts and grouping metadata are Athena-zone
analytics the reference's catalog exists to serve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_BPE_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


@register(
    "q_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS INTEGER)
             AS n_bpe_tokens,
           CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                AS INTEGER) AS n_ws_tokens
    FROM documents
    """,
)
def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish pre-tokenizer regex (letter runs,
    single digits, single punctuation — the GPT-2-family split rule
    reduced to engine-portable ASCII classes) next to the whitespace
    count. The BPE-ish count is the budget currency of the packing /
    salience / chunking tier (llm/sampling.py counts whitespace
    tokens; real pipelines budget in subword units — digits and
    punctuation splitting are why the two diverge).

    100 TB: regexp_extract_all is a codegen'd JVM expression — the
    whole pass is a narrow projection on the scan, no shuffle, no
    Python. A real learned BPE vocabulary needs the Pandas-UDF path
    (q_pandas_udf_tokens); this regex is the right 90% approximation
    for budgeting."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0))
        .cast("int")
        .alias("n_bpe_tokens"),
        F.size(
            F.filter(F.split("text", " "), lambda t: t != "")
        )
        .cast("int")
        .alias("n_ws_tokens"),
    )


@register(
    "q_bitmap_distinct",
    oracle="""
    SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_distinct_cust
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct count via bitmap words: bucket the key space
    into 64-wide blocks, OR each key's bit into its block word, then
    sum popcounts. Equal by construction to COUNT(DISTINCT) — the
    oracle — but, unlike it, the bitmap state is MERGEABLE: partial
    bitmaps from different partitions/days combine by bit_or, the
    exact-count analogue of the HLL sketch rollup (q_hll_mergeable).

    100 TB: COUNT(DISTINCT) expands + reshuffles every raw row;
    bitmaps shuffle at most (groups × key_space/64) words, each
    carrying up to 64 observations — the standard roaring-bitmap
    trick in plain SQL. Dense integer key spaces only; sparse keys
    need a dictionary pass first."""
    o = load(spark, sf_dir, "orders")
    words = (
        o.select(
            "o_orderpriority",
            F.expr("o_custkey div 64").alias("bucket"),
            F.expr("CAST(o_custkey % 64 AS INT)").alias("bit"),
        )
        .groupBy("o_orderpriority", "bucket")
        .agg(F.expr("bit_or(shiftleft(1L, bit))").alias("word"))
    )
    return words.groupBy("o_orderpriority").agg(
        F.sum(F.bit_count("word")).alias("n_distinct_cust")
    )


_LSH_BITS = 8


@register(
    "q_hyperplane_lsh",
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) - 1 AS pos,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000)
                  AS BIGINT) AS qv
      FROM embeddings
    ),
    dots AS (
      SELECT vec_id,
             {", ".join(
                 f"SUM(CASE WHEN md5('{j}:' || CAST(pos AS VARCHAR)) < '8' "
                 f"THEN qv ELSE -qv END) AS d{j}"
                 for j in range(_LSH_BITS)
             )}
      FROM q GROUP BY vec_id
    ),
    sig AS (
      SELECT vec_id,
             {" || ".join(
                 f"(CASE WHEN d{j} >= 0 THEN '1' ELSE '0' END)"
                 for j in range(_LSH_BITS)
             )} AS bucket
      FROM dots
    )
    SELECT vec_id, bucket,
           COUNT(*) OVER (PARTITION BY bucket) AS n_in_bucket
    FROM sig
    """,
)
def q_hyperplane_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH (SimHash for dense vectors): 8 signed
    projections bucket each embedding by the sign pattern of its dot
    products with ±1 hyperplanes (plane j's sign at dimension i is
    md5('j:i') < '8' — deterministic, engine-portable, no RNG state).
    Components are quantized to integers (FLOOR(v·1000)) BEFORE the
    dot product, so the projection sums are associative integer
    arithmetic and the sign — the only thing the bucket depends on —
    is exact on both engines (a float dot product could flip a
    near-zero sign between engines; cf. the angular counterpart of
    the coordinate-space q_simhash).

    100 TB: one narrow explode + one map-side-combinable aggregate
    per vector — no pairwise work at all; candidate pairs come from
    equal buckets (expected collisions concentrate near-duplicates at
    cos θ ≈ 1 with P[same bit] = 1 − θ/π). Widen bits or AND/OR
    multiple tables to trade recall vs bucket size; this is the
    embedding-side analogue of the MinHash band trick
    (q_lsh_candidates)."""
    q = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("pos", "v"))
        .select(
            "vec_id",
            "pos",
            F.floor(F.col("v").cast("double") * 1000).cast("bigint").alias("qv"),
        )
    )
    signed = [
        F.sum(
            F.when(
                F.md5(F.concat(F.lit(f"{j}:"), F.col("pos").cast("string")))
                < "8",
                F.col("qv"),
            ).otherwise(-F.col("qv"))
        ).alias(f"d{j}")
        for j in range(_LSH_BITS)
    ]
    dots = q.groupBy("vec_id").agg(*signed)
    bucket = F.concat(
        *[
            F.when(F.col(f"d{j}") >= 0, "1").otherwise("0")
            for j in range(_LSH_BITS)
        ]
    ).alias("bucket")
    sig = dots.select("vec_id", bucket)
    from pyspark.sql import Window

    return sig.select(
        "vec_id",
        "bucket",
        F.count(F.lit(1))
        .over(Window.partitionBy("bucket"))
        .alias("n_in_bucket"),
    )


@register(
    "q_grouping_id",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup with grouping_id(): the aggregation-level bitmask that
    lets consumers distinguish a real NULL group from a subtotal row
    — the metadata column q_rollup/q_cube omit. Spark's grouping_id()
    bit order (first column = MSB) is reconstructed in the oracle
    from per-column GROUPING() flags.

    100 TB: rollup executes as a single Expand + hash aggregate (one
    shuffle for all 3 levels); grouping_id is free metadata on the
    expand, not an extra pass."""
    return (
        load(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "gid", "n_orders"
        )
    )
