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
        # materialize the round ONCE, then read both the convergence
        # probe and the next-round labels from the checkpointed blocks
        # (the former filter+count probe / checkpoint pair executed
        # the join+aggregate twice per round — r12 optimization,
        # measured ~2x per-round cost)
        updated = updated.localCheckpoint(eager=True)
        changed = (
            updated.filter(F.col("new_label") != F.col("label")).limit(1).count()
        )
        labels = updated.select("node", F.col("new_label").alias("label"))
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


def token_set_reps(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    keep_text: bool = False,
) -> DataFrame:
    """(id, rep_id): rep = min id among documents with the IDENTICAL
    distinct-token set (post normalize_text tokenization — the exact
    input both MinHash signatures and Jaccard verification consume).

    This is the exact-dedup collapse that makes near-dup clustering
    linear in DISTINCT texts instead of quadratic in duplicates:
    identical-set documents have identical signatures, identical LSH
    bands, and Jaccard 1 with each other and identical Jaccard with
    everyone else — so each group is a clique whose members share one
    neighborhood, and running the pair mine + fixpoint on the
    REPRESENTATIVES then expanding component labels through rep_id is
    bit-equivalent to running it on the full corpus (rep = group min
    ⇒ the component's min rep IS the component's min member).  On a
    replicated corpus this converts an O(dups²) edge list into
    O(distinct²) — measured 8.08 M verified pairs → thousands at
    sf0.1."""
    from lakehouse_ecommerce_etl_pipeline_spark.functions.text import (
        normalize_text,
    )

    toks = F.filter(
        F.split(normalize_text(text_col), " "), lambda t: t != ""
    )
    # an EMPTY token set produces no signature, no bands, and an
    # undefined Jaccard — such documents are never paired in the full
    # chain, so each must stay its OWN group (a per-doc key), not
    # collapse with other empty docs
    keyed_cols = [
        F.col(id_col),
        F.when(
            F.size(toks) > 0,
            F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))),
        )
        .otherwise(F.concat(F.lit("empty:"), F.col(id_col).cast("string")))
        .alias("tkey"),
    ]
    # keep_text: the artifact-build path carries the text through the
    # tkey join instead of re-joining on the id afterwards — an id
    # equi-join assumes id uniqueness and would silently fan out
    # duplicate-id sources (r9 ADVICE)
    if keep_text:
        keyed_cols.append(F.col(text_col))
    keyed = docs.select(*keyed_cols)
    reps = keyed.groupBy("tkey").agg(F.min(id_col).alias("rep_id"))
    out_cols = [id_col, "rep_id"] + ([text_col] if keep_text else [])
    return keyed.join(reps, "tkey").select(*out_cols)
