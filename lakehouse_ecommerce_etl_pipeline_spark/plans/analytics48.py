"""Analytics tier XLVIII: systematic sampling, null-skew join
routing, local graph structure.

New shapes over I-XLVII: the systematic (every k-th after total
order) sample auditors actually ask for, the null-key join ROUTING
pattern (rows with NULL join keys bypass the shuffle entirely — the
single most common real-world join-skew fix, since null is always the
most frequent key), and two local graph-structure statistics on the
co-purchase graph: per-node clustering coefficient (how cliquish a
part's neighborhood is) and exact 2-hop neighborhood size (the
friends-of-friends reach behind recommendation candidate pools).

Cross-engine exactness: sampling is rank arithmetic over a total
order; the routed join is value-identical to the plain outer join by
construction; graph statistics are integer counts with at most one
final division."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import (
    load,
    order_part_edges,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics16 import (
    degree_oriented_copurchase_edges,
    oriented_triangles,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_EVERY_K = 97  # prime step — never resonates with data periodicity

_PAIRS_CTE = """
    d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM d a JOIN d b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
"""


@register(
    "q_systematic_sample",
    oracle=f"""
    WITH r AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
      FROM orders
    )
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM r WHERE rn % {_EVERY_K} = 1
    """,
)
def q_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic sampling: every {_EVERY_K}-th order in key order —
    the audit-grade sample (census/quality-inspection style) whose
    membership is a pure function of position, reproducible by anyone
    holding the sorted data.  A prime step avoids resonating with any
    periodic structure in key assignment.  Complements the
    hash-membership samples (q_split_train_val's md5 family): those
    survive REPARTITIONING, this one survives EYEBALLING — an auditor
    can recompute it by hand.

    PRODUCTION PLAN: the boundary-cut exact global row number
    (operators/ranks.py) — key-range cuts from a percentile probe
    become literals, positions are per-bucket row_number + broadcast
    offsets; no global sort, bit-equal to ROW_NUMBER for the unique
    key order (window twin pytest-pinned; oracle unchanged).  Output
    is 1/k of the input — the sample leaves the cluster, the
    population never does."""
    from lakehouse_ecommerce_etl_pipeline_spark.operators.ranks import (
        with_global_row_number,
    )

    return (
        with_global_row_number(
            load(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_totalprice"
            ),
            ["o_orderkey"],
            primary="o_orderkey",
            rn="rn",
        )
        .filter(F.col("rn") % _EVERY_K == 1)
        .drop("rn")
    )


def q_systematic_sample_window_form(spark: SparkSession, sf_dir: str):
    """ROW_NUMBER oracle-exactness twin (former production plan),
    pytest-pinned equal to the boundary-cut form."""
    w = Window.orderBy("o_orderkey")
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") % _EVERY_K == 1)
        .drop("rn")
    )


@register(
    "q_null_skew_join",
    oracle="""
    WITH o AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 0 THEN NULL
                  ELSE o_custkey END AS cust_fk,
             o_totalprice
      FROM orders
    )
    SELECT o.o_orderkey, o.cust_fk, c.c_mktsegment,
           CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
    FROM o LEFT JOIN customer c ON c.c_custkey = o.cust_fk
    """,
)
def q_null_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The null-key routing pattern: a left join where a tenth of the
    fact rows carry a NULL FK (every real fact table's unmatched
    lines).  NULL never matches, but a naive plan still SHUFFLES all
    null rows into one reducer — null is invariably the #1 skew key.
    The routed plan splits the fact: null-key rows bypass the join
    entirely (projected straight to the output shape with a NULL dim
    side) and only keyed rows join; the union is value-identical to
    the plain LEFT JOIN the oracle runs.

    100 TB: the split is a codegen'd filter (no extra scan — both
    branches read the same exchange); the join side shuffles only
    matchable rows; the null branch is map-only.  The same routing
    applies to any high-frequency unmatchable key, with AQE skew-join
    as the fallback when the hot keys ARE matchable."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 10 == 0, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("cust_fk"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    keyed = (
        o.filter(F.col("cust_fk").isNotNull())
        .join(cust, F.col("cust_fk") == F.col("c_custkey"), "left")
        .select("o_orderkey", "cust_fk", "c_mktsegment", "cents")
    )
    routed = o.filter(F.col("cust_fk").isNull()).select(
        "o_orderkey",
        "cust_fk",
        F.lit(None).cast("string").alias("c_mktsegment"),
        "cents",
    )
    return keyed.unionByName(routed)


@register(
    "q_clustering_coefficient",
    oracle=f"""
    WITH {_PAIRS_CTE},
    sym AS (
      SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e
    ),
    deg AS (
      SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM sym GROUP BY src
    ),
    tri AS (
      SELECT t.node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
        SELECT e1.src AS node FROM e e1
        JOIN e e2 ON e2.src = e1.dst
        JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
        UNION ALL
        SELECT e1.dst FROM e e1
        JOIN e e2 ON e2.src = e1.dst
        JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
        UNION ALL
        SELECT e2.dst FROM e e1
        JOIN e e2 ON e2.src = e1.dst
        JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
      ) t GROUP BY t.node
    )
    SELECT d.node, d.degree, COALESCE(tri.n_tri, 0) AS n_triangles,
           CASE WHEN d.degree >= 2 THEN
             CAST(2 * COALESCE(tri.n_tri, 0) AS DOUBLE)
               / CAST(d.degree * (d.degree - 1) AS DOUBLE)
           ELSE 0.0 END AS clustering
    FROM deg d LEFT JOIN tri ON tri.node = d.node
    """,
)
def q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient on the co-purchase
    graph: 2·triangles(v) / (deg(v)·(deg(v)−1)) — how interconnected
    a part's co-purchase neighborhood is (cliquish accessories vs
    hub staples), the local refinement of the global triangle count
    (q_triangle_count).  Triangles are enumerated once on the
    (degree, id)-oriented edge list (``oriented_triangles`` — each
    triangle exactly once, wedge fan-out O(sqrt(|E|)) even at hub
    nodes) and credited to all three corners via a single explode —
    NOT a three-branch union of the triangle subplan, which Spark
    would execute three times (measured 17.4× growth for 10× data
    before the explode; three wedge joins collapse to one); the
    triangle SET is orientation-invariant, so the key-oriented
    oracle is unchanged.

    Integer headroom (DESIGN §19, unconditional DECIMAL(38,0)
    class): deg·(deg−1) and 2·n_tri are count products whose
    operands grow with data volume, so both run on DECIMAL(38,0)
    before the double release — decimal→double rounds to the same
    nearest double as the oracle's bigint→double below the int64
    bound, and the plan no longer ceilings at deg ≈ 3.04e9."""
    e = order_part_edges(spark, sf_dir)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )
    tris = oriented_triangles(
        oriented=degree_oriented_copurchase_edges(spark, sf_dir)
    )
    corners = tris.select(
        F.explode(F.array("pivot", "a", "c")).alias("node")
    )
    tri = corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tri")
    )
    n_tri = F.coalesce("n_tri", F.lit(0))
    dec = "decimal(38,0)"
    out = deg.join(tri, "node", "left").select(
        "node",
        "degree",
        n_tri.alias("n_triangles"),
        F.when(
            F.col("degree") >= 2,
            (n_tri.cast(dec) * 2).cast("double")
            / (
                F.col("degree").cast(dec)
                * (F.col("degree") - 1).cast(dec)
            ).cast("double"),
        )
        .otherwise(0.0)
        .alias("clustering"),
    )
    return out


@register(
    "q_two_hop_neighbors",
    oracle=f"""
    WITH {_PAIRS_CTE},
    sym AS (
      SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e
    ),
    n1 AS (SELECT DISTINCT src AS node, dst AS nb FROM sym),
    n2 AS (
      SELECT DISTINCT a.node, b.dst AS nb2
      FROM n1 a JOIN sym b ON b.src = a.nb
      WHERE b.dst <> a.node
    ),
    fof AS (
      SELECT n2.node, CAST(COUNT(*) AS BIGINT) AS n_two_hop
      FROM n2
      LEFT JOIN n1 ON n1.node = n2.node AND n1.nb = n2.nb2
      WHERE n1.nb IS NULL
      GROUP BY n2.node
    )
    SELECT s.src AS node,
           CAST(COUNT(*) AS BIGINT) AS degree,
           COALESCE(MAX(fof.n_two_hop), 0) AS n_two_hop
    FROM sym s LEFT JOIN fof ON fof.node = s.src
    GROUP BY s.src
    """,
)
def q_two_hop_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact friends-of-friends reach: for each part, the number of
    DISTINCT parts exactly two hops away (reachable via a shared
    co-purchase neighbor, not a direct neighbor, not itself) — the
    candidate-pool size a recommender's second ring draws from, and
    the denominator behind 'path-of-length-2' link prediction
    scores.  Set semantics throughout: distinct neighbor pairs, then
    an anti-join subtracts the first ring.

    100 TB: one self-join of the adjacency list (the frontier
    expansion) with distinct collapsing multiplicity before the
    anti-join — the same profile as one BFS hop (q_bfs_distances)
    but per-source exhaustive.  On dense graphs this is the operator
    you CAP (per-node neighbor sampling) — stated, not silently
    done: this query is exact."""
    e = order_part_edges(spark, sf_dir)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # order_part_edges is DISTINCT (src < dst) by construction, so the
    # symmetric orientation is already a set — the former .distinct()
    # here was a redundant full exchange of |2E| rows (r12
    # optimization, guide §2.4; the oracle's DISTINCT stays, DuckDB
    # plans it however it likes)
    n1 = sym.select(F.col("src").alias("node"), F.col("dst").alias("nb"))
    hop = n1.alias("a").join(
        sym.alias("b"), F.col("b.src") == F.col("a.nb")
    )
    n2 = (
        hop.filter(F.col("b.dst") != F.col("a.node"))
        .select(F.col("a.node").alias("node"), F.col("b.dst").alias("nb2"))
        .distinct()
    )
    fof = (
        n2.join(
            n1.select(
                F.col("node").alias("j_node"), F.col("nb").alias("j_nb")
            ),
            (F.col("node") == F.col("j_node")) & (F.col("nb2") == F.col("j_nb")),
            "left_anti",
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_two_hop"))
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )
    return deg.join(fof, "node", "left").select(
        "node", "degree", F.coalesce("n_two_hop", F.lit(0)).alias("n_two_hop")
    )
