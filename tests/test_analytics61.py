from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics61 import (
    _FD_CANDIDATES,
    _KEY_CANDIDATES,
    q_candidate_keys,
    q_functional_deps,
)

SF0001 = "/root/testdata/sf0.001"


def _pdf(table: str) -> pd.DataFrame:
    return pd.read_parquet(f"{SF0001}/{table}.parquet")


def test_functional_deps_match_pandas(spark):
    got = {r["candidate"]: r for r in q_functional_deps(spark, SF0001).collect()}
    assert len(got) == len(_FD_CANDIDATES)
    for table, lhs, rhs in _FD_CANDIDATES:
        name = f"{table}:{'+'.join(lhs)}->{rhs}"
        nun = _pdf(table).groupby(list(lhs))[rhs].nunique()
        row = got[name]
        assert row["n_lhs_groups"] == len(nun)
        assert row["n_violating_groups"] == int((nun > 1).sum())
        assert row["max_rhs_per_lhs"] == int(nun.max())
        assert row["holds"] == bool(nun.max() == 1)


def test_fd_verdicts_cover_both_branches(spark):
    rows = q_functional_deps(spark, SF0001).collect()
    verdicts = {r["holds"] for r in rows}
    assert verdicts == {True, False}


def test_candidate_keys_match_pandas(spark):
    got = {r["candidate"]: r for r in q_candidate_keys(spark, SF0001).collect()}
    assert len(got) == len(_KEY_CANDIDATES)
    for table, cols in _KEY_CANDIDATES:
        name = f"{table}:{'+'.join(cols)}"
        pdf = _pdf(table)
        row = got[name]
        assert row["n_rows"] == len(pdf)
        assert row["n_distinct"] == len(pdf[list(cols)].drop_duplicates())
        assert row["is_key"] == (len(pdf) == len(pdf[list(cols)].drop_duplicates()))
