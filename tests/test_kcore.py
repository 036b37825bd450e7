"""q_kcore parity vs an independent pure-Python peeler over the same
co-purchase edge set (no Spark in the reference path beyond reading
the edges), plus the defining structural invariants."""

from __future__ import annotations

from collections import defaultdict

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import order_part_edges
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics16 import (
    kcore_k,
    q_kcore,
)

SF = "/root/testdata/sf0.001"




def _py_kcore(edges: list[tuple[int, int]], k: int) -> dict[int, int]:
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    return {n: len(ns) for n, ns in adj.items()}


def test_kcore_matches_independent_peeler(spark):
    edges = [
        (r["src"], r["dst"]) for r in order_part_edges(spark, SF).collect()
    ]
    from collections import Counter

    deg0 = Counter()
    for a, b in edges:
        deg0[a] += 1
        deg0[b] += 1
    k_ref = min(deg0.values()) + 1
    assert kcore_k(spark, SF) == k_ref
    ref = _py_kcore(edges, k_ref)
    got = {r["node"]: r["core_deg"] for r in q_kcore(spark, SF).collect()}
    assert got == ref
    # defining invariant: every member has >= k neighbors IN the core
    assert all(d >= k_ref for d in got.values())
    # the median threshold actually peels (and cascades below it)
    n_nodes = len({n for e in edges for n in e})
    assert 0 < len(got) < n_nodes
