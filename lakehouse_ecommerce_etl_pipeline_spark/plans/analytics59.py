"""Analytics tier LIX: weighted shortest paths and exact A/B testing.

Two shapes the corpus did not yet cover:

- **q_sssp_weighted** — bounded Bellman-Ford over the WEIGHTED
  co-purchase graph: the weighted sibling of q_bfs_distances (which
  relaxes hop counts) and the last of the classic graph fixpoints
  (min-label components, min-hop BFS, weighted pagerank, k-core —
  and now min-COST).  Edge cost is an exact integer derived from
  co-purchase strength (strong edges are cheap), so the min fixpoint
  is unique and both engines agree bit-for-bit.

- **q_ab_test_exact** — the two-proportion z-test decided entirely in
  integer arithmetic: for each customer market segment, is its
  order-fulfillment rate significantly different from the rest of the
  population at the 95% level?  The textbook test compares
  z^2 = (p1-p2)^2 / (p(1-p)(1/n1+1/n2)) against 1.96^2; clearing
  denominators turns the decision into one integer inequality
      10000*n*(s1*n2 - s2*n1)^2  >=  38416*s*(n-s)*n1*n2
  (s = s1+s2, n = n1+n2) — no floats anywhere a verdict depends on,
  so the released decision column is exactly reproducible.

Reference parity: the reference's validation scripts stop at COUNT(*)
guards (lakehouse-ecommerce-etl-pipeline glue_jobs/load_orders.py); these
tiers extend the analytics surface the same engine serves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import (
    load,
    order_part_pairs,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_SEED_MOD = 997
_ROUNDS = 3
# cost(edge) = 1 + floor(1000 / n_co): strong co-purchase = cheap hop,
# weak = expensive; integer, total, and identical in both engines.
_COST = "1 + CAST(FLOOR(1000.0 / n_co) AS BIGINT)"

_WEDGES_CTE = f"""
    d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    cnt AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst, COUNT(*) AS n_co
      FROM d a JOIN d b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    we AS (SELECT src, dst, {_COST} AS w FROM cnt),
    sym AS (
      SELECT src, dst, w FROM we
      UNION ALL
      SELECT dst AS src, src AS dst, w FROM we
    )
"""


def _relax(prev: str, nxt: str) -> str:
    return f"""
    {nxt} AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT * FROM {prev}
        UNION ALL
        SELECT s.dst AS node, p.dist + s.w AS dist
        FROM sym s JOIN {prev} p ON s.src = p.node
      ) GROUP BY node
    )"""


@register(
    "q_sssp_weighted",
    oracle=f"""
    WITH {_WEDGES_CTE},
    d0 AS (
      SELECT p_partkey AS node, CAST(0 AS BIGINT) AS dist FROM part
      WHERE p_partkey % {_SEED_MOD} = 0
    ),
    {_relax("d0", "d1")},
    {_relax("d1", "d2")},
    {_relax("d2", "d3")}
    SELECT node, CAST(dist AS BIGINT) AS dist FROM d3
    """,
)
def q_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source bounded Bellman-Ford: minimum path COST within 3
    relaxation rounds from the seed part set, over the symmetric
    co-purchase graph with integer edge costs (cheap = frequently
    co-purchased).  Synchronous relaxation: every round joins the
    current distance table against the edge list and takes the
    per-node min of (keep, relax) — after k rounds each node holds
    the cheapest path using at most k edges, the classic
    Bellman-Ford invariant.

    100 TB: identical shuffle shape to q_bfs_distances — the
    |reached-nodes| distance table broadcasts onto the cached edge
    list each round (edges never move); the round bound caps work,
    and at real scale only the frontier delta (nodes whose dist
    improved last round) joins the edges.  Edge weights ride along as
    one extra bigint column — weighting adds zero shuffle versus
    BFS."""
    pairs = order_part_pairs(spark, sf_dir)
    we = (
        pairs.groupBy("src", "dst")
        .agg(F.count("*").alias("n_co"))
        .select("src", "dst", F.expr(_COST).alias("w"))
    )
    # r12 optimization (guide §1.2/§2.4, the q_pagerank/q_connected_
    # components unroll applied to the third fixed-round kernel):
    # _ROUNDS is a small constant and there is no convergence probe,
    # so the relaxations chain LAZILY into one physical plan instead
    # of the former persist()+count() barrier per round plus a final
    # localCheckpoint (6 blocking driver actions → one job).  The
    # Bellman-Ford "keep" term rides a WEIGHT-0 SELF-LOOP per
    # reachable node (graph nodes ∪ seeds — seeds can be edgeless
    # parts) instead of a union with the previous distance table:
    # min(dist(v), min over u→v of dist(u)+w) is then ONE
    # join+aggregate and the previous generation appears only inside
    # the round's broadcast build (the union form re-executed it — see
    # q_connected_components).  AQE exchange reuse is EXPECTED to
    # dedup the weighted-edge subtree across rounds at runtime — the
    # committed pre-execution dump shows the subtree per round
    # (ReusedExchange appears only in the final adaptive plan), so
    # the win rests on the interleaved A/B timings and the oracle,
    # not the dump (r12 ADVICE item 3); dist is an integer MIN
    # fixpoint over integer path costs — partitioning-independent by
    # construction.
    seeds = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % _SEED_MOD == 0)
        .select(F.col("p_partkey").alias("node"))
    )
    sym0 = we.unionByName(
        we.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    loop_nodes = (
        sym0.select("src").unionByName(seeds.select(F.col("node").alias("src")))
        .distinct()
    )
    sym = sym0.unionByName(
        loop_nodes.select(
            "src", F.col("src").alias("dst"), F.lit(0).cast("bigint").alias("w")
        )
    ).repartition("src")
    dist = seeds.select("node", F.lit(0).cast("long").alias("dist"))
    for _ in range(_ROUNDS):
        dist = (
            sym.join(F.broadcast(dist), sym["src"] == dist["node"])
            .groupBy(F.col("dst"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("dist"))
            .select(F.col("dst").alias("node"), "dist")
        )
    return dist.select("node", F.col("dist").cast("long").alias("dist"))


@register(
    "q_ab_test_exact",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS segment,
             CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS hit
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    per AS (
      SELECT segment, SUM(hit) AS s1, COUNT(*) AS n1 FROM j
      GROUP BY segment
    ),
    tot AS (SELECT SUM(s1) AS s, SUM(n1) AS n FROM per),
    x AS (
      SELECT p.segment,
             CAST(p.s1 AS HUGEINT) AS s1, CAST(p.n1 AS HUGEINT) AS n1,
             CAST(t.s - p.s1 AS HUGEINT) AS s2,
             CAST(t.n - p.n1 AS HUGEINT) AS n2,
             CAST(t.s AS HUGEINT) AS s, CAST(t.n AS HUGEINT) AS n
      FROM per p CROSS JOIN tot t
    )
    SELECT segment,
           CAST(s1 AS BIGINT) AS successes,
           CAST(n1 AS BIGINT) AS trials,
           CAST(s2 AS BIGINT) AS rest_successes,
           CAST(n2 AS BIGINT) AS rest_trials,
           10000 * n * (s1 * n2 - s2 * n1) * (s1 * n2 - s2 * n1)
             >= 38416 * s * (n - s) * n1 * n2 AS significant
    FROM x
    """,
)
def q_ab_test_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test per market segment against the rest of
    the population (success = order fulfilled, status 'F'), decided
    at alpha = 0.05 by the cleared-denominator integer inequality

        10000*n*(s1*n2 - s2*n1)^2 >= 38416*s*(n-s)*n1*n2

    (38416/10000 = 1.96^2; s, n pooled).  The products are evaluated
    in DECIMAL(38,0) on the Spark side and HUGEINT in the oracle —
    both exact integer domains, so the boolean verdict is
    bit-reproducible, unlike any float z-score pipeline.

    100 TB: one partial-aggregated count per segment (the groupBy
    collapses to |segments| rows map-side), a 1-row total broadcast
    back, and the test itself is driver-free per-row integer algebra
    on a |segments|-row table.  A/B verdicts cost exactly what the
    underlying counts cost.  DECIMAL(38,0) headroom: the largest
    product is 10000*n*(s1*n2)^2 ~ 1e4 * n^5 — safe past n = 1e6
    trials per test cell; beyond that, scale the constants down
    (divide both sides by gcd 16) or test per-stratum."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    j = orders.join(
        customer.select("c_custkey", "c_mktsegment"),
        orders.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("hit"),
    )
    per = j.groupBy("segment").agg(
        F.sum("hit").alias("s1"), F.count("*").alias("n1")
    )
    tot = per.agg(
        F.sum("s1").alias("s"), F.sum("n1").alias("n")
    )
    dec = "decimal(38,0)"
    x = per.crossJoin(F.broadcast(tot)).select(
        "segment",
        F.col("s1").cast(dec).alias("s1"),
        F.col("n1").cast(dec).alias("n1"),
        (F.col("s") - F.col("s1")).cast(dec).alias("s2"),
        (F.col("n") - F.col("n1")).cast(dec).alias("n2"),
        F.col("s").cast(dec).alias("s"),
        F.col("n").cast(dec).alias("n"),
    )
    diff = F.col("s1") * F.col("n2") - F.col("s2") * F.col("n1")
    lhs = F.lit(10000).cast(dec) * F.col("n") * diff * diff
    rhs = (
        F.lit(38416).cast(dec)
        * F.col("s")
        * (F.col("n") - F.col("s"))
        * F.col("n1")
        * F.col("n2")
    )
    return x.select(
        "segment",
        F.col("s1").cast("long").alias("successes"),
        F.col("n1").cast("long").alias("trials"),
        F.col("s2").cast("long").alias("rest_successes"),
        F.col("n2").cast("long").alias("rest_trials"),
        (lhs >= rhs).alias("significant"),
    )
