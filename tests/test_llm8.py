from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.llm.dedup import (
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures_universal,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.llm8 import (
    q_near_dup_clusters,
)

SF0001 = "/root/testdata/sf0.001"


def test_clusters_cover_corpus_and_respect_edges(spark):
    docs = load(spark, SF0001, "documents")
    out = q_near_dup_clusters(spark, SF0001)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == docs.count()
    # labels are min-propagated: never above the doc's own id
    for d, r in rows.items():
        assert r["cluster"] <= d
        assert r["is_representative"] == (r["cluster"] == d)
    # each verified near-dup pair ended in the same cluster
    sigs = minhash_signatures_universal(docs, "doc_id", "text", 8)
    cand = lsh_candidate_pairs(sigs, "doc_id", 8, 2)
    dup = (
        jaccard_pairs(docs, "doc_id", "text", pairs=cand)
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    )
    assert dup, "expected near-dup pairs at sf0.001"
    for p in dup:
        assert rows[p["id_a"]]["cluster"] == rows[p["id_b"]]["cluster"], p
    # docs without any edge are their own singleton representative
    linked = {p["id_a"] for p in dup} | {p["id_b"] for p in dup}
    for d, r in rows.items():
        if d not in linked:
            assert r["cluster"] == d


def test_exactly_one_representative_per_cluster(spark):
    out = q_near_dup_clusters(spark, SF0001)
    per = (
        out.groupBy("cluster")
        .agg(
            F.sum(F.col("is_representative").cast("int")).alias("n_rep"),
            F.min("doc_id").alias("min_doc"),
        )
        .collect()
    )
    for r in per:
        assert r["n_rep"] == 1
        assert r["cluster"] == r["min_doc"]
