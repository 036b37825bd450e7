from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.llm4 import (
    q_contamination_ngrams,
    q_repetition_score,
)

SF0001 = "/root/testdata/sf0.001"


def test_contamination_excludes_benchmark_docs(spark):
    rows = q_contamination_ngrams(spark, SF0001).collect()
    for r in rows:
        assert r["doc_id"] % 50 != 0  # benchmark docs never self-flag
        assert r["n_shared_shingles"] >= 1


def test_repetition_score_bounds_and_coverage(spark):
    rows = q_repetition_score(spark, SF0001).collect()
    n_docs_3tok = (
        load(spark, SF0001, "documents")
        .filter(
            F.size(
                F.expr(
                    "filter(split(trim(regexp_replace(lower(text),"
                    " '\\\\s+', ' ')), ' '), t -> t != '')"
                )
            )
            >= 3
        )
        .count()
    )
    assert len(rows) == n_docs_3tok
    for r in rows:
        assert 0.0 <= r["rep_ratio"] < 1.0
        assert r["n_unique"] <= r["n_trigrams"]
        assert r["n_unique"] >= 1
