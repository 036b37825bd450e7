"""Connected components over near-duplicate pairs — the dedup
endgame: LSH/Jaccard emit PAIRS, but removal needs CLUSTERS (a~b, b~c
⇒ {a,b,c} keep one). Classic iterative large-star/small-star label
propagation expressed as DataFrame joins.

Algorithm (min-label propagation):
  label(v) ← v
  repeat: label(v) ← min(label(v), min over neighbors' labels)
  until no label changes.

Converges in O(diameter) rounds; near-dup graphs have tiny components
(pairs/triples), so 2-3 rounds typical. Each round is two
shuffles (join + min-aggregate). The driver loop only checks a scalar
convergence count — no data ever collects.

100 TB notes: localCheckpoint each round truncates the lineage (an
iterated plan otherwise grows exponentially for Catalyst); label
propagation's shuffle volume is O(E) per round. For pathological
diameters use the alternating large/small-star variant — same join
primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) — component = min node id reachable.

    ``pairs`` is an undirected edge list; isolated nodes absent from
    it simply keep their own id (callers union them back if needed).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        # materialize once: every iteration joins edges, and without
        # this the full upstream lineage (LSH/Jaccard at the call
        # site) re-executes per round
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("new_label"),
                "label",
            )
        )
        changed = updated.filter(F.col("new_label") != F.col("label")).limit(1).count()
        labels = updated.select(
            "node", F.col("new_label").alias("label")
        ).localCheckpoint(eager=True)
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("component"))


def dedup_keep_list(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """The final dedup verdict: one row per input id with its component
    and ``keep`` flag (true iff the id is its component's minimum —
    exactly one survivor per near-dup cluster; singletons survive)."""
    comps = connected_components(pairs, id_a, id_b)
    labeled = df.select(F.col(id_col)).join(
        comps, df[id_col] == comps.node, "left"
    ).select(
        F.col(id_col),
        F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
    )
    return labeled.withColumn("keep", F.col(id_col) == F.col("component"))
