"""Analytics tier XII: text normalization (LLM preprocessing) and a
grid-blocked spatial radius self-join.

Cross-engine exactness: normalization is lower + two regexp_replace
passes with regexes both Java-regex and RE2 interpret identically
(plain character classes, no lookaround; DuckDB needs the 'g' flag to
match Spark's replace-all default). The radius join is pure integer
arithmetic — synthetic integer coordinates, squared-distance
comparison — so blocking+refine on Spark must equal DuckDB's brute
force O(n^2) oracle exactly.

Reference parity: the reference normalizes free-text columns with
chained trim/initcap/regexp (glue_jobs/product_etl.py:52-71); the
corpus-level normalization pass generalizes that to the documents
table. The radius join has no reference analogue — it is the spatial
blocking pattern the training-data tier needs (geo dedup, location
joins) expressed with the same block-then-refine shape as the LSH and
edit-distance dedups.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


@register(
    "q_text_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(
                  regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                  ' +', ' ', 'g')) AS norm_text,
           CAST(length(trim(regexp_replace(
                  regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                  ' +', ' ', 'g'))) AS BIGINT) AS n_chars_norm
    FROM documents
    """,
)
def q_text_normalize(spark, sf_dir):
    """Corpus normalization pass: casefold, strip non-alphanumerics to
    spaces, collapse whitespace, trim — the canonical-text input the
    dedup family (MinHash/Jaccard/SimHash) and tokenizer should run
    on, kept as a standalone oracle-checked operator.

    100 TB: three chained codegen'd string expressions — narrow, zero
    shuffle, streams through the scan. Normalize ONCE and write the
    canonical column next to the raw text; every downstream dedup/
    quality pass then reads the normalized column instead of
    re-deriving it (the reference's per-job re-trim pattern inverted)."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).cast("bigint").alias("n_chars_norm"),
    )


_CELL = 64  # grid cell edge >= radius, so neighbors cover the disc
_RADIUS = 64


@register(
    "q_grid_radius_join",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS id,
             (c_custkey * c_custkey * 37 + c_custkey * 101) % 10000 AS x,
             (c_custkey * c_custkey * 53 + c_custkey * 71) % 10000 AS y
      FROM customer
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS BIGINT)
             AS dist_sq
    FROM pts a JOIN pts b
      ON a.id < b.id
     AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {_RADIUS * _RADIUS}
    ORDER BY id_a, id_b
    """,
)
def q_grid_radius_join(spark, sf_dir):
    """Spatial radius self-join with grid blocking: points (integer
    coordinates derived from the customer key) are bucketed into
    64-unit grid cells; the probe side replicates each point to
    its 3x3 cell neighborhood, so an equi-join on cell id sees every
    pair within the 64-unit radius, and the integer squared-distance
    refine keeps exact matches only. The oracle is the brute-force
    O(n^2) distance join — blocking must lose nothing.

    100 TB: the cell equi-join shuffles O(9n) rows instead of
    comparing O(n^2) pairs — same block-then-refine shape as the LSH
    (llm/lsh.py) and edit-distance (plans/analytics7.py) dedups, with
    cell id as the blocking key. Cell edge >= radius keeps the
    neighborhood at 9 cells; dense hotspots (skewed cells) salt the
    cell key exactly like any skewed join key."""
    k = F.col("c_custkey")
    pts = load(spark, sf_dir, "customer").select(
        k.alias("id"),
        ((k * k * 37 + k * 101) % 10000).alias("x"),
        ((k * k * 53 + k * 71) % 10000).alias("y"),
    )
    build = pts.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        ((F.col("x") / _CELL).cast("long")).alias("cx"),
        ((F.col("y") / _CELL).cast("long")).alias("cy"),
    )
    # probe side: replicate each point to its 3x3 neighborhood
    off = F.explode(F.sequence(F.lit(-1), F.lit(1)))
    probe = (
        pts.select(
            F.col("id").alias("id_b"),
            F.col("x").alias("xb"),
            F.col("y").alias("yb"),
            ((F.col("x") / _CELL).cast("long")).alias("pcx"),
            ((F.col("y") / _CELL).cast("long")).alias("pcy"),
        )
        .withColumn("dx", off)
        .withColumn("dy", off)
        .select(
            "id_b",
            "xb",
            "yb",
            (F.col("pcx") + F.col("dx")).alias("cx"),
            (F.col("pcy") + F.col("dy")).alias("cy"),
        )
    )
    dist_sq = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        build.join(probe, ["cx", "cy"])
        .filter((F.col("id_a") < F.col("id_b")) & (dist_sq <= _RADIUS * _RADIUS))
        .select(
            "id_a", "id_b", dist_sq.cast("bigint").alias("dist_sq")
        )
    )
