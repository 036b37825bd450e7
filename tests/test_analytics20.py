from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics20 import (
    q_chi2_independence,
    q_minhash_estimate_quality,
    q_time_to_convert,
)

SF0001 = "/root/testdata/sf0.001"


def test_chi2_statistic_nonnegative_with_correct_dof(spark):
    r = q_chi2_independence(spark, SF0001).first()
    assert r["chi2_stat"] >= 0.0
    assert r["dof"] == (3 - 1) * (5 - 1)
    assert r["n"] > 0


def test_minhash_estimate_tracks_true_jaccard(spark):
    rows = q_minhash_estimate_quality(spark, SF0001).collect()
    assert rows
    n_exact = 0
    for r in rows:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["true_jaccard"] <= 1.0
        if abs(r["est_jaccard"] - r["true_jaccard"]) <= 0.35:
            n_exact += 1
    # the estimator is unbiased: the vast majority of candidate pairs
    # estimate within a coarse band of truth even at 8 permutations
    assert n_exact >= 0.8 * len(rows)


def test_time_to_convert_percentiles_ordered(spark):
    r = q_time_to_convert(spark, SF0001).first()
    assert r["n_converted"] > 0
    assert 0 <= r["median_s"] <= r["p90_s"]


def test_moving_median_first_row_equals_value(spark):
    from pyspark.sql import functions as F

    from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics20 import (
        q_moving_median,
    )

    mm = q_moving_median(spark, SF0001)
    first = (
        load(spark, SF0001, "events")
        .groupBy("user_id")
        .agg(F.min_by("event_id", F.struct("ts", "event_id")).alias("event_id"))
    )
    joined = mm.join(first, ["user_id", "event_id"]).collect()
    assert joined
    for r in joined:
        assert r["moving_median"] == r["value"]  # 1-row frame


def test_quantile_buckets_are_balanced_deciles(spark):
    from pyspark.sql import functions as F

    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics20 import (
        q_quantile_bucket_assign,
    )

    df = q_quantile_bucket_assign(spark, SF0001)
    sizes = {
        r["decile"]: r["n"]
        for r in df.groupBy("decile").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(sizes) == set(range(1, 11))
    # equi-depth up to interpolation ties: no bucket off by >2 from ideal
    n = sum(sizes.values())
    for v in sizes.values():
        assert abs(v - n / 10) <= 2


def test_feature_moments_match_numpy(spark):
    import numpy as np

    from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics20 import (
        q_feature_moments,
    )

    rows = {r["pos"]: r for r in q_feature_moments(spark, SF0001).collect()}
    mat = np.array(
        [r["embedding"] for r in load(spark, SF0001, "embeddings").collect()],
        dtype=np.float64,
    )
    assert len(rows) == mat.shape[1] == 64
    for pos in (0, 31, 63):
        q = np.floor(mat[:, pos] * 1e5)
        assert abs(rows[pos]["mean"] - q.mean() / 1e5) < 1e-9
        assert abs(rows[pos]["stddev"] - q.std() / 1e5) < 1e-6
        assert rows[pos]["lo"] == mat[:, pos].min()
        assert rows[pos]["hi"] == mat[:, pos].max()


def test_sql_udf_matches_inline_expression(spark):
    from pyspark.sql import functions as F

    from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics20 import (
        q_sql_udf,
    )

    got = {
        r["l_returnflag"]: (r["net_revenue"], r["n_lines"])
        for r in q_sql_udf(spark, SF0001).collect()
    }
    rev = F.expr(
        "CAST(l_extendedprice AS DECIMAL(12,2))"
        " * (1 - CAST(l_discount AS DECIMAL(4,2)))"
    )
    want = {
        r["l_returnflag"]: (r["net_revenue"], r["n_lines"])
        for r in load(spark, SF0001, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.sum(rev).cast("double").alias("net_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .collect()
    }
    assert got == want


def test_dow_hour_heatmap_dense_and_total(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics20 import (
        q_dow_hour_heatmap,
    )

    rows = q_dow_hour_heatmap(spark, SF0001).collect()
    assert all(0 <= r["dow"] <= 6 for r in rows)
    total = sum(r[f"h{h:02d}"] for r in rows for h in range(24))
    assert total == load(spark, SF0001, "events").count()


def test_sequence_pattern_counts_conversions(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics20 import (
        q_sequence_pattern,
    )

    rows = q_sequence_pattern(spark, SF0001).collect()
    assert rows
    import re

    for r in rows:
        assert set(r["journey"]) <= {"v", "c", "p", "s", "e"}
        assert r["n_conversions"] == len(
            re.findall(r"v[ce]*p", r["journey"])
        )
        assert r["has_direct_conversion"] == ("vp" in r["journey"])


def test_weighted_avg_between_min_and_max_discount(spark):
    from pyspark.sql import functions as F

    from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics20 import (
        q_weighted_avg,
    )

    lo, hi = (
        load(spark, SF0001, "lineitem")
        .agg(F.min("l_discount"), F.max("l_discount"))
        .first()
    )
    for r in q_weighted_avg(spark, SF0001).collect():
        assert lo - 1e-12 <= r["wavg_discount"] <= hi + 1e-12


def test_quintile_transition_matrix_is_dense_and_conserves_customers(spark):
    from pyspark.sql import functions as F

    from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics20 import (
        q_quintile_transition,
    )

    rows = q_quintile_transition(spark, SF0001).collect()
    assert all(1 <= r["q_before"] <= 5 and 1 <= r["q_after"] <= 5 for r in rows)
    o = load(spark, SF0001, "orders")
    both = (
        o.select(
            "o_custkey",
            (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            .cast("int")
            .alias("early"),
        )
        .groupBy("o_custkey")
        .agg(F.count_distinct("early").alias("np"))
        .filter(F.col("np") == 2)
        .count()
    )
    assert sum(r["n_customers"] for r in rows) == both
