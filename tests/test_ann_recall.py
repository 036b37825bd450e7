"""ANN recall identities: full-probe IVF ≡ exact, recall monotone in
probe count, and the registered recall query's structural bounds."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_ecommerce_etl_pipeline_spark.plans.llm18 import ivf_recall

SF0001 = "/root/testdata/sf0.001"


def test_full_probe_equals_exact(spark):
    """Probing every cell removes the approximation entirely: IVF
    candidate set = whole corpus, ranking identical → recall 1.0 on
    every panel query."""
    rec = ivf_recall(spark, SF0001, n_probe=8, n_centroids=8).collect()
    assert rec, "empty panel"
    assert all(r.recall == 1.0 for r in rec), [
        (r.qid, r.recall) for r in rec if r.recall != 1.0
    ]


def test_recall_monotone_in_probe(spark):
    """More probed cells can only add candidates, never remove them —
    aggregate recall must be non-decreasing in n_probe, and positive
    even at probe 1 (the query's own cell holds its neighbors)."""
    r1 = sum(r.n_hit for r in ivf_recall(spark, SF0001, n_probe=1).collect())
    r2 = sum(r.n_hit for r in ivf_recall(spark, SF0001, n_probe=2).collect())
    r4 = sum(r.n_hit for r in ivf_recall(spark, SF0001, n_probe=4).collect())
    assert 0 < r1 <= r2 <= r4
