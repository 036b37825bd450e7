from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics16 import (
    q_integer_islands,
    q_median_mad_outliers,
    q_mode_per_group,
    q_mom_growth,
    q_pagerank,
    q_triangle_count,
)

SF0001 = "/root/testdata/sf0.001"


def test_mad_outliers_actually_deviate(spark):
    rows = q_median_mad_outliers(spark, SF0001).collect()
    for r in rows:
        assert abs(r["c_acctbal"] - r["seg_median"]) > 1.5 * r["seg_mad"]


def test_islands_are_disjoint_and_cover_all_minutes(spark):
    rows = sorted(
        q_integer_islands(spark, SF0001).collect(),
        key=lambda r: r["island_start"],
    )
    assert rows
    total = 0
    for prev, cur in zip(rows, rows[1:]):
        # a gap of at least one missing minute separates islands
        assert cur["island_start"] > prev["island_end"] + 1
    for r in rows:
        assert r["n_minutes"] == r["island_end"] - r["island_start"] + 1
        total += r["n_minutes"]
    n_minutes = (
        load(spark, SF0001, "events")
        .select(F.expr("unix_timestamp(date_trunc('minute', ts)) div 60"))
        .distinct()
        .count()
    )
    assert total == n_minutes


def test_mom_growth_matches_revenue_ratio(spark):
    rows = sorted(q_mom_growth(spark, SF0001).collect(), key=lambda r: r["month"])
    assert rows[0]["mom_growth"] is None
    for prev, cur in zip(rows, rows[1:]):
        want = (cur["revenue"] - prev["revenue"]) / prev["revenue"]
        assert math.isclose(cur["mom_growth"], want, rel_tol=1e-12)


def test_mode_is_the_max_count_value(spark):
    modes = {
        r["l_returnflag"]: (r["modal_quantity"], r["n_lines"])
        for r in q_mode_per_group(spark, SF0001).collect()
    }
    counts = (
        load(spark, SF0001, "lineitem")
        .groupBy("l_returnflag", "l_quantity")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    best: dict[str, int] = {}
    for r in counts:
        best[r["l_returnflag"]] = max(best.get(r["l_returnflag"], 0), r["n"])
    for flag, (_, n) in modes.items():
        assert n == best[flag]


def test_triangle_count_nonnegative_and_bounded(spark):
    n_tri = q_triangle_count(spark, SF0001).first()["n_triangles"]
    assert n_tri >= 0
    # every triangle needs 3 distinct co-purchase edges
    d = (
        load(spark, SF0001, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = d.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = d.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    n_edges = (
        a.join(b, "ok").filter(F.col("pa") < F.col("pb")).select("pa", "pb")
        .distinct().count()
    )
    assert n_tri <= n_edges * n_edges


def test_pagerank_mass_and_positivity(spark):
    rows = q_pagerank(spark, SF0001).collect()
    assert rows
    for r in rows:
        assert r["pagerank"] > 0
    # total mass stays ~1 on a symmetric (dangling-free) graph
    assert math.isclose(sum(r["pagerank"] for r in rows), 1.0, rel_tol=1e-6)


# --------------------------------------------- degree orientation (r9)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src bigint, dst bigint"
    )


def test_degree_orientation_star_hub_emits_zero_wedges(spark):
    """The skewed-graph regression VERDICT r8 task 2 asks for: a star
    (one hub, k leaves, no leaf-leaf edges) has zero triangles, and
    under (degree, id) orientation it must also enumerate ZERO wedges
    — every star edge points INTO the hub (leaves have degree 1), so
    no node has two out-edges.  Key orientation (src < dst) with the
    hub at the smallest id would blow up to C(k, 2) = 190 wedges."""
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics16 import (
        degree_oriented_edges,
        oriented_wedges,
    )

    k = 20
    hub = 0  # smallest id: the adversarial case for key orientation
    star = _edges_df(spark, [(hub, leaf) for leaf in range(1, k + 1)])
    oriented = degree_oriented_edges(star)
    # every edge points leaf -> hub
    rows = oriented.collect()
    assert len(rows) == k
    assert all(r["dst"] == hub for r in rows)
    assert oriented_wedges(oriented).count() == 0


def test_degree_orientation_wedge_fanout_is_capped(spark):
    """Hub with leaf-leaf chords: wedges must come only from the
    low-degree corners, never fan out from the hub.  Graph: hub h
    joined to leaves 1..12, plus chords (1,2) and (3,4) → exactly 2
    triangles; the hub (degree 12) is the (degree, id)-largest node
    so its out-degree is 0 and total wedge count is exactly the 2
    chord wedges + 0 — independent of hub degree."""
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics16 import (
        degree_oriented_edges,
        oriented_triangles,
        oriented_wedges,
    )

    hub = 0
    edges = [(hub, leaf) for leaf in range(1, 13)] + [(1, 2), (3, 4)]
    e = _edges_df(spark, edges)
    oriented = degree_oriented_edges(e)
    assert oriented.filter(F.col("src") == hub).count() == 0
    # each chord endpoint (degree 2) orients chord-then-hub: the two
    # wedges (1;2,h),(2;1,h)... exactly one per chord survives the
    # (deg,id) pair ordering; both close through the hub edges
    assert oriented_wedges(oriented).count() == 2
    tris = oriented_triangles(e).collect()
    assert len(tris) == 2
    corners = sorted(sorted((r["pivot"], r["a"], r["c"])) for r in tris)
    assert corners == [[0, 1, 2], [0, 3, 4]]


def test_oriented_triangles_match_bruteforce(spark):
    """Exactly-once triangle enumeration pinned against a pure-Python
    brute force on a dense-ish 9-node graph (includes a 4-clique:
    multiple overlapping triangles per edge)."""
    from itertools import combinations

    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics16 import (
        oriented_triangles,
    )

    edges = (
        list(combinations([1, 2, 3, 4], 2))  # 4-clique
        + [(4, 5), (5, 6), (4, 6)]  # pendant triangle
        + [(6, 7), (7, 8), (8, 9)]  # path (no triangles)
    )
    adj = set(edges) | {(b, a) for a, b in edges}
    nodes = sorted({n for e in edges for n in e})
    expect = sorted(
        [a, b, c]
        for a, b, c in combinations(nodes, 3)
        if (a, b) in adj and (b, c) in adj and (a, c) in adj
    )
    got = sorted(
        sorted((r["pivot"], r["a"], r["c"]))
        for r in oriented_triangles(_edges_df(spark, edges)).collect()
    )
    assert got == expect
    assert len(expect) == 5  # C(4,3) from the clique + the pendant
