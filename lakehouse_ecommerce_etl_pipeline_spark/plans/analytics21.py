"""Analytics tier XXI: graph components, inequality stats, DQ gates.

New shapes over I-XX: bounded min-label propagation (the synchronous
connected-components kernel — second iterative-graph operator after
q_pagerank, this one ALL-INTEGER so the oracle is trivially exact),
a Gini concentration coefficient per market segment (classic
inequality statistic, made bit-exact by folding the whole formula
into one decimal-exact numerator/denominator and a single final
double division), and a Deequ-style data-quality expectation report
(one conditional-aggregation pass per table + an orphan anti-join,
emitted as a long-form constraint/observed/passed table — the
reference *docs* promise exactly this validation suite,
docs/full_implementation_guide.md:142-151, with no code behind it).

Cross-engine exactness: integer MIN fixpoints are engine-free;
decimal sums are associative; the only float ops are final IEEE
multiply/divide on identical inputs (no a-b*c shapes, so the DuckDB
FMA-contraction trap from q_feature_moments cannot bite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import (
    load,
    order_part_edges,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

# Same co-purchase graph as q_triangle_count / q_pagerank
# (plans/analytics16.py): parts adjacent iff they share an order.
_PAIRS_CTE = """
    d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM d a JOIN d b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
"""

_CC_ITERS = 3


def _cc_round(prev: str, nxt: str) -> str:
    return f"""
    {nxt} AS (
      SELECT node, MIN(lbl) AS lbl FROM (
        SELECT node, lbl FROM {prev}
        UNION ALL
        SELECT ed.dst AS node, l.lbl
        FROM edges ed JOIN {prev} l ON l.node = ed.src
      ) GROUP BY node
    )"""


@register(
    "q_connected_components",
    oracle=f"""
    WITH {_PAIRS_CTE},
    edges AS (
      SELECT src, dst FROM e
      UNION ALL
      SELECT dst AS src, src AS dst FROM e
    ),
    l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),
    {_cc_round('l0', 'l1')},
    {_cc_round('l1', 'l2')},
    {_cc_round('l2', 'l3')}
    SELECT node, lbl AS component FROM l3
    """,
)
def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous min-label propagation over the co-purchase graph,
    {_CC_ITERS} rounds: every node adopts the smallest node id seen in
    its <=k-hop neighborhood. Labels are integers, MIN is idempotent/
    associative/commutative, so unlike PageRank no quantization is
    needed — the fixpoint prefix is bit-identical on any engine and
    any partitioning (the driver oracle replays the same 3 rounds).

    100 TB: the per-round cost is one broadcast (labels out) and one
    shuffle (MIN by dst). At billions of nodes the label table stops
    being broadcastable — then co-partition labels and edges on the
    join key (both sides hash-partitioned once, zero per-round edge
    movement) and switch to large-star/small-star (Kiveris et al.)
    so the round count is O(log n) instead of O(diameter)."""
    half = order_part_edges(spark, sf_dir)
    edges = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # r12 optimization (guide §1.2/§2.4, the q_pagerank unroll applied
    # to the second fixed-round kernel): _CC_ITERS is a small constant
    # and the loop has no convergence probe, so the rounds chain
    # LAZILY into one physical plan instead of the former
    # persist()+count() barrier per round plus a final parquet spill
    # (5 blocking driver actions → one job).  The "keep my own label"
    # term rides a SELF-LOOP per node instead of a union with the
    # previous generation: min(lbl(v), min over in-neighbors) is then
    # ONE join+aggregate, and the previous generation appears only
    # inside the round's broadcast build — the union form referenced
    # it a second time in plain (non-broadcast) position, which AQE
    # cannot fold into the broadcast build, so each generation
    # re-executed (the subplan audit caught exactly that duplicated
    # join).  The repartition("dst") edge exchange is EXPECTED to be
    # deduplicated across rounds by AQE exchange reuse at runtime —
    # the committed pre-execution plan dump shows the subtree per
    # round (ReusedExchange only appears in the final adaptive plan,
    # unlike q_pagerank whose dump happens to show it), so the win
    # here rests on the interleaved A/B timings and the oracle, not
    # the dump (r12 ADVICE item 3); labels are integer MIN fixpoints,
    # so values are partitioning-independent by construction.
    nodes = edges.select("src").distinct()
    ed = edges.unionByName(
        nodes.select("src", F.col("src").alias("dst"))
    ).repartition("dst")
    lbl = nodes.select(F.col("src").alias("node"), F.col("src").alias("lbl"))
    for _ in range(_CC_ITERS):
        lbl = (
            ed.join(F.broadcast(lbl), ed["src"] == lbl["node"])
            .groupBy(F.col("dst"))
            .agg(F.min("lbl").alias("lbl"))
            .select(F.col("dst").alias("node"), "lbl")
        )
    return lbl.select("node", F.col("lbl").alias("component"))


# ------------------------------------------------- Gini concentration


@register(
    "q_gini_spend",
    oracle="""
    WITH spend AS (
      SELECT c.c_custkey, c.c_mktsegment,
             CAST(CAST(FLOOR(CAST(SUM(CAST(ROUND(o.o_totalprice * 100)
                                            AS BIGINT)) AS DOUBLE) / 100.0)
                       AS BIGINT) AS DECIMAL(18,0)) AS spend
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_mktsegment
    ),
    ranked AS (
      SELECT c_mktsegment, spend,
             ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment ORDER BY spend, c_custkey) AS i,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM spend
    ),
    terms AS (
      SELECT c_mktsegment, n, spend,
             CAST(CAST(2 * i - n - 1 AS DECIMAL(10,0)) * spend
                  AS DECIMAL(38,0)) AS term
      FROM ranked
    )
    SELECT c_mktsegment,
           CAST(MAX(n) AS BIGINT) AS n_customers,
           CAST(SUM(term) AS DOUBLE)
             / (CAST(MAX(n) AS DOUBLE) * CAST(SUM(spend) AS DOUBLE)) AS gini
    FROM terms
    GROUP BY c_mktsegment
    """,
)
def q_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer lifetime spend per market segment
    — how concentrated revenue is among customers (0 = perfectly
    even, →1 = one whale). Uses the sorted-rank identity
    G = Σ(2i−n−1)·x_i / (n·Σx_i): spend is summed on the BIGINT cents
    lattice (DESIGN §21 rule 3 — no double→decimal cast on either
    engine) then floored to a whole-dollar grid (exact: non-divisible
    cents/100 sits ≥0.01 from any integer, ≫ double error; scale-0
    decimal after that) so the numerator and denominator are
    decimal-EXACT integers below 2^53 — the bound that keeps the
    decimal→double cast single-rounded on both engines (DuckDB's
    hugeint cast path multi-rounds above it) — and the only float
    operation is one final multiply+divide on identical inputs.

    100 TB: the rank i needs a per-segment total order — a range-
    partitioned sort within each segment (Spark's window already
    sort-shuffles by (segment, spend)); with few segments and many
    customers the skew fix is two-phase ranking (per-partition
    pre-rank + offset merge). Everything after the rank is a plain
    map + one aggregation."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    spend = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.floor(
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("bigint")
                ).cast("double")
                / F.lit(100.0)
            )
            .cast("bigint")
            .cast("decimal(18,0)")
            .alias("spend")
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy("spend", "c_custkey")
    wn = Window.partitionBy("c_mktsegment")
    ranked = spend.select(
        "c_mktsegment",
        "spend",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    terms = ranked.select(
        "c_mktsegment",
        "n",
        "spend",
        (
            (2 * F.col("i") - F.col("n") - 1).cast("decimal(10,0)")
            * F.col("spend")
        )
        .cast("decimal(38,0)")
        .alias("term"),
    )
    return terms.groupBy("c_mktsegment").agg(
        F.max("n").cast("long").alias("n_customers"),
        (
            F.sum("term").cast("double")
            / (F.max("n").cast("double") * F.sum("spend").cast("double"))
        ).alias("gini"),
    )


# ------------------------------------------------- DQ expectations


@register(
    "q_dq_expectations",
    oracle="""
    WITH o AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS row_count,
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS pk_dupes,
             CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
               AS null_custkey,
             CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
               AS nonpos_price
      FROM orders
    ),
    orphans AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS c FROM lineitem li
      WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_orderkey = li.l_orderkey)
    ),
    badflag AS (
      SELECT CAST(COUNT(*) FILTER (
               WHERE l_returnflag NOT IN ('A', 'N', 'R')) AS BIGINT) AS c
      FROM lineitem
    )
    SELECT 'orders' AS table_name, 'row_count_positive' AS constraint_name,
           row_count AS observed,
           CASE WHEN row_count > 0 THEN 1 ELSE 0 END AS passed FROM o
    UNION ALL
    SELECT 'orders', 'pk_unique_o_orderkey', pk_dupes,
           CASE WHEN pk_dupes = 0 THEN 1 ELSE 0 END FROM o
    UNION ALL
    SELECT 'orders', 'complete_o_custkey', null_custkey,
           CASE WHEN null_custkey = 0 THEN 1 ELSE 0 END FROM o
    UNION ALL
    SELECT 'orders', 'positive_o_totalprice', nonpos_price,
           CASE WHEN nonpos_price = 0 THEN 1 ELSE 0 END FROM o
    UNION ALL
    SELECT 'lineitem', 'fk_l_orderkey_in_orders', c,
           CASE WHEN c = 0 THEN 1 ELSE 0 END FROM orphans
    UNION ALL
    SELECT 'lineitem', 'accepted_values_l_returnflag', c,
           CASE WHEN c = 0 THEN 1 ELSE 0 END FROM badflag
    """,
)
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality expectation suite: completeness,
    PK uniqueness, value-range, accepted-values, and FK-orphan
    checks, reported long-form as (table, constraint, observed,
    passed). The reference's docs specify this validation tier
    (docs/full_implementation_guide.md:142-151 — range checks,
    positivity, error tables) with no code; this is the queryable
    report those docs describe.

    100 TB: all per-table metrics ride ONE conditional-aggregation
    scan per table (no per-constraint passes — the same single-pass
    trick Deequ compiles to); the FK check is a broadcast-or-shuffle
    anti-join that Catalyst plans like any other join. The final
    UNION of six 1-row aggregates is driver-trivial."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    def _report(table: str, constraint: str, observed, cond):
        return [
            F.lit(table),
            F.lit(constraint),
            observed.cast("long"),
            F.when(cond, 1).otherwise(0),
        ]

    oagg = o.agg(
        F.count(F.lit(1)).alias("row_count"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("pk_dupes"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_custkey"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("nonpos_price"),
    )
    orders_rows = oagg.select(
        F.stack(
            F.lit(4),
            *_report(
                "orders", "row_count_positive",
                F.col("row_count"), F.col("row_count") > 0,
            ),
            *_report(
                "orders", "pk_unique_o_orderkey",
                F.col("pk_dupes"), F.col("pk_dupes") == 0,
            ),
            *_report(
                "orders", "complete_o_custkey",
                F.col("null_custkey"), F.col("null_custkey") == 0,
            ),
            *_report(
                "orders", "positive_o_totalprice",
                F.col("nonpos_price"), F.col("nonpos_price") == 0,
            ),
        ).alias("table_name", "constraint_name", "observed", "passed")
    )
    orphans = (
        li.join(o.select("o_orderkey"),
                li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.stack(
                F.lit(1),
                *_report(
                    "lineitem", "fk_l_orderkey_in_orders",
                    F.col("c"), F.col("c") == 0,
                ),
            ).alias("table_name", "constraint_name", "observed", "passed")
        )
    )
    badflag = (
        li.agg(
            F.count(
                F.when(~F.col("l_returnflag").isin("A", "N", "R"), 1)
            ).alias("c")
        )
        .select(
            F.stack(
                F.lit(1),
                *_report(
                    "lineitem", "accepted_values_l_returnflag",
                    F.col("c"), F.col("c") == 0,
                ),
            ).alias("table_name", "constraint_name", "observed", "passed")
        )
    )
    return orders_rows.unionByName(orphans).unionByName(badflag)
