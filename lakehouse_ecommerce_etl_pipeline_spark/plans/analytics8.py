"""Analytics tier VIII: oracle-checked multimodal byte-stats,
higher-order array functions, JSON-map explode, and incremental
(partial-merge) aggregation.

Cross-engine exactness: every value here is an integer, an md5 hex
string, or a DECIMAL-exact sum — no float accumulation anywhere.
md5 is the one digest both engines share (Spark hashes the binary
payload, DuckDB hashes the VARCHAR's UTF-8 bytes — identical input
bytes, identical hex). ``strlen`` in DuckDB is byte length, matching
Spark's ``octet_length`` over the encoded payload.

Reference parity: the reference's quality layer normalizes and
validates per-row columns (glue_jobs/orders_etl.py:44-78); the
incremental-merge query reproduces the nightly-batch pattern its Step
Function implies (one new monthly file merged into standing Delta
aggregates — step_functions/lakehouse_etl_stepfunction.json:37,96).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.llm.multimodal import synthetic_blobs
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


@register(
    "q_multimodal_bytestats",
    oracle="""
    SELECT doc_id AS content_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS digest,
           CASE WHEN substr(md5(text), 1, 1) <= '5' THEN 'png'
                WHEN substr(md5(text), 1, 1) <= 'a' THEN 'jpeg'
                ELSE 'webp' END AS fmt
    FROM documents
    """,
)
def q_multimodal_bytestats(spark, sf_dir):
    """Oracle-checked metadata pass over a binary media column: byte
    length, content digest, and a digest-derived format bucket — all
    JVM-side (octet_length/md5 are codegen'd Catalyst expressions), the
    scale-path complement to the Arrow/mapInPandas decode plumbing in
    llm/multimodal.py (q_multimodal_meta).

    100 TB: this is the "metadata first" half of the multimodal
    recipe — compute the small per-blob stats table without ever
    shuffling payload bytes; downstream filters/joins run on this
    narrow table and re-read payloads only for surviving rows (parquet
    column pruning keeps untouched payload columns free)."""
    blobs = synthetic_blobs(load(spark, sf_dir, "documents"))
    digest = F.md5("payload")
    first = F.substring(digest, 1, 1)
    return blobs.select(
        F.col("content_id"),
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        digest.alias("digest"),
        F.when(first <= "5", "png")
        .when(first <= "a", "jpeg")
        .otherwise("webp")
        .alias("fmt"),
    )


@register(
    "q_higher_order_fns",
    oracle="""
    SELECT doc_id,
           CAST(list_sum(list_transform(string_split(text, ' '),
                                        t -> length(t))) AS BIGINT)
             AS total_token_chars,
           CAST(len(list_filter(string_split(text, ' '),
                                t -> length(t) >= 6)) AS BIGINT)
             AS n_long_tokens,
           CAST(list_max(list_transform(string_split(text, ' '),
                                        t -> length(t))) AS INTEGER)
             AS longest_token,
           CAST(list_sum(list_transform(string_split(text, ' '),
                                        t -> length(t) * length(t)))
                AS BIGINT) AS sum_sq_token_chars
    FROM documents
    """,
)
def q_higher_order_fns(spark, sf_dir):
    """Higher-order array functions — transform / filter / aggregate /
    zip_with — over per-document token-length arrays. All-integer
    arithmetic so both engines agree exactly.

    100 TB: lambda expressions run inside whole-stage codegen on the
    JVM (no Python round-trip), narrow (zero shuffle), and the array
    never leaves the row — this is the pattern that replaces
    explode+groupBy re-aggregation (which would shuffle O(tokens)
    rows) for per-row array reductions."""
    toks = F.split(F.col("text"), " ")
    lens = F.transform(toks, lambda t: F.length(t))
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.aggregate(
            lens, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("total_token_chars"),
        F.size(F.filter(toks, lambda t: F.length(t) >= 6))
        .cast("bigint")
        .alias("n_long_tokens"),
        F.array_max(lens).cast("int").alias("longest_token"),
        F.aggregate(
            F.zip_with(lens, lens, lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("sum_sq_token_chars"),
    )


@register(
    "q_props_map_explode",
    oracle="""
    SELECT event_type, key AS prop_key,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.' || key) AS BIGINT))
                AS BIGINT) AS sum_val
    FROM (SELECT event_type, props, unnest(json_keys(props)) AS key
          FROM events) t
    GROUP BY event_type, key
    ORDER BY event_type, prop_key
    """,
)
def q_props_map_explode(spark, sf_dir):
    """Semi-structured map handling: parse the JSON props column into
    MAP<STRING,BIGINT>, explode to (key, value) rows, aggregate per
    (event_type, key). Integer sums — exact on both engines.

    100 TB: from_json + explode is the standard schema-on-read path
    for ragged event properties; the explode is narrow (rows fan out
    in place), and only the small exploded projection — not the raw
    JSON string — enters the shuffle for the final aggregation."""
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        ev.select("event_type", F.explode(m).alias("prop_key", "prop_val"))
        .groupBy("event_type", "prop_key")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("prop_val").alias("sum_val"),
        )
        .orderBy("event_type", "prop_key")
    )


@register(
    "q_incremental_agg_merge",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS total_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_incremental_agg_merge(spark, sf_dir):
    """Incremental aggregate maintenance: partial aggregates computed
    on the standing data (orders before 1998) and on a new batch
    (orders from 1998 on) are MERGED — counts summed, integer-cents
    sums summed — instead of recomputing from scratch. The oracle is
    the from-scratch full aggregate: int64 cents sums are associative
    (DESIGN §21 rule 3), so merge-of-partials is bit-identical to
    recompute on any engine build.

    100 TB: this is how materialized aggregates stay fresh — each
    batch contributes one tiny partial-agg table (O(groups) rows) and
    the merge touches no historical raw data. Exactly the Spark
    partial/final hash-aggregate contract, lifted to cross-batch
    scope. Reference analogue: the monthly Step Function batch landing
    into standing Delta tables."""
    orders = load(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01").cast("timestamp")

    def partial(df):
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("cents"),
        )

    base = partial(orders.filter(F.col("o_orderdate") < cutoff))
    batch = partial(orders.filter(F.col("o_orderdate") >= cutoff))
    return (
        base.unionByName(batch)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_orders"),
            (F.sum("cents").cast("double") / F.lit(100.0)).alias(
                "total_price"
            ),
        )
        .orderBy("o_orderpriority")
    )
