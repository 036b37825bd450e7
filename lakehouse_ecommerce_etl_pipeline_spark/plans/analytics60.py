"""Analytics tier LX: spatial containment and character statistics.

Two shapes the corpus did not yet cover:

- **q_point_in_polygon** — geofence containment: assign every
  customer point to the polygons that contain it, via the even-odd
  (ray-casting) rule evaluated ENTIRELY in integer arithmetic.  Each
  polygon edge is oriented bottom-up (yl < yu, horizontal edges
  dropped) and a rightward ray from point (x, y) crosses the edge iff

      yl <= y < yu  AND  (x - xl)*(yu - yl) < (xu - xl)*(y - yl)

  — the standard intersection test with the division cleared, so the
  parity decision is exact and bit-identical in both engines.  The
  polygon set is small and literal, so the crossing sum COMPILES INTO
  THE PROJECTION (constant-folded CASE ladder inside whole-stage
  codegen): the plan is one parquet scan + one 1-row aggregate —
  no join, no shuffle on the point side.  With a LARGE polygon
  catalog the same test becomes a broadcast join of the oriented
  edge table against points followed by a parity groupBy on
  (point, poly); the bounded-literal form here is the degenerate
  broadcast.  100 TB: points stream through a map-side projection;
  the only shuffle is the final |polygons|-row aggregate.

- **q_char_ioc** — per-document character-level index of coincidence
  (collision probability), the exact-rational cousin of character
  entropy: ioc = sum_c n_c*(n_c-1) / (n*(n-1)).  A classic
  gibberish/uniformity signal for corpus curation (random byte soup
  scores near 1/|alphabet|; natural text scores far higher) that —
  unlike Shannon entropy — needs no transcendental functions, so the
  released double is one IEEE division of exact integers and
  cross-engine bit-stable.  Plan: explode positions -> substr
  (pipelined, never materialized), partial-aggregated count per
  (doc, char) so the shuffle carries only distinct (doc, char) pairs
  (bounded by docs x alphabet, NOT by corpus characters), then one
  per-doc rollup.  100 TB: per-row explode volume is map-local; the
  wire cost stays O(docs * alphabet).

Reference parity: the reference's per-table validation stops at
COUNT(*) guards (lakehouse-ecommerce-etl-pipeline glue_jobs/load_orders.py);
these tiers extend the same engine's analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

# Integer-vertex polygons in the [0, 1000)^2 point lattice; l_shape is
# concave (the ray-cast parity actually matters), triangle has a
# non-axis-aligned hypotenuse, quad is a convex sanity case.
POLYGONS: dict[str, list[tuple[int, int]]] = {
    "l_shape": [(100, 500), (450, 500), (450, 700), (300, 700), (300, 900), (100, 900)],
    "triangle": [(500, 100), (900, 150), (700, 450)],
    "quad": [(550, 550), (950, 600), (900, 950), (600, 900)],
}

# Deterministic point derivation shared by both engines: two coprime
# multipliers spread custkeys over the lattice.
_PX = "(c_custkey * 48271) % 1000"
_PY = "(c_custkey * 16807) % 1000"


def crossing_sum_sql(x: str, y: str, verts: list[tuple[int, int]]) -> str:
    """ANSI-SQL integer crossing count of a rightward ray from
    (``x``, ``y``) against the polygon's non-horizontal edges; the
    same text parses in Spark SQL and DuckDB, so both engines run the
    identical decision arithmetic."""
    terms = []
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        if y1 == y2:
            continue  # horizontal edges never cross a horizontal ray
        (xl, yl), (xu, yu) = ((x1, y1), (x2, y2)) if y1 < y2 else ((x2, y2), (x1, y1))
        terms.append(
            f"(CASE WHEN {yl} <= {y} AND {y} < {yu} "
            f"AND ({x} - {xl}) * {yu - yl} < {xu - xl} * ({y} - {yl}) "
            f"THEN 1 ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def inside_sql(x: str, y: str, verts: list[tuple[int, int]]) -> str:
    return f"({crossing_sum_sql(x, y, verts)} % 2 = 1)"


def _pip_oracle() -> str:
    arms = []
    for name, verts in POLYGONS.items():
        ins = inside_sql("x", "y", verts)
        arms.append(
            f"SELECT '{name}' AS poly_id, "
            f"CAST(SUM(CASE WHEN {ins} THEN 1 ELSE 0 END) AS BIGINT) AS n_inside, "
            f"CAST(SUM(CASE WHEN {ins} THEN k ELSE 0 END) AS BIGINT) AS key_checksum "
            f"FROM p"
        )
    return (
        f"WITH p AS (SELECT c_custkey AS k, {_PX} AS x, {_PY} AS y FROM customer) "
        + " UNION ALL ".join(arms)
    )


@register("q_point_in_polygon", oracle=_pip_oracle())
def q_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.expr(_PX).alias("x"),
        F.expr(_PY).alias("y"),
    )
    aggs = []
    for name, verts in POLYGONS.items():
        inside = F.expr(inside_sql("x", "y", verts))
        aggs.append(
            F.sum(F.when(inside, F.lit(1)).otherwise(F.lit(0)))
            .cast("bigint")
            .alias(f"n_{name}")
        )
        aggs.append(
            F.sum(F.when(inside, F.col("k")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias(f"s_{name}")
        )
    one = pts.agg(*aggs)
    stack = ", ".join(f"'{nm}', n_{nm}, s_{nm}" for nm in POLYGONS)
    return one.select(
        F.expr(
            f"stack({len(POLYGONS)}, {stack}) AS (poly_id, n_inside, key_checksum)"
        )
    )


_IOC_ORACLE = """
WITH ch AS (
  SELECT doc_id, substring(text, g, 1) AS ch
  FROM (
    SELECT doc_id, text, unnest(generate_series(1, length(text))) AS g
    FROM documents WHERE length(text) >= 2
  )
),
c AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY doc_id, ch)
SELECT doc_id,
  CAST(SUM(c) AS BIGINT) AS len_chars,
  CAST(COUNT(*) AS BIGINT) AS distinct_chars,
  CAST(MAX(c) AS BIGINT) AS top_char_count,
  CAST(SUM(c * (c - 1)) AS BIGINT) AS coll_num,
  CAST(SUM(c * (c - 1)) AS BIGINT)
    / (CAST(SUM(c) AS BIGINT) * (CAST(SUM(c) AS BIGINT) - 1)) AS ioc
FROM c GROUP BY doc_id
"""


@register("q_char_ioc", oracle=_IOC_ORACLE)
def q_char_ioc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.length("text") >= 2)
    )
    chars = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("text"))).alias("g"),
        "text",
    ).select("doc_id", F.col("text").substr(F.col("g"), F.lit(1)).alias("ch"))
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c").cast("bigint")
    coll = F.sum(F.col("c") * (F.col("c") - 1)).cast("bigint")
    return counts.groupBy("doc_id").agg(
        n.alias("len_chars"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_chars"),
        F.max("c").cast("bigint").alias("top_char_count"),
        coll.alias("coll_num"),
        (coll / (n * (n - F.lit(1)))).alias("ioc"),
    )
