"""Skew salting and bucketing — the explicit 100 TB techniques. The
bucketing test asserts the PLAN property (no shuffle), not just the
result."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.operators.skew import (
    salted_agg,
    salted_join,
)
from lakehouse_ecommerce_etl_pipeline_spark.sinks.bucketing import (
    read_table,
    write_bucketed,
)


def test_salted_agg_matches_plain(spark):
    df = spark.range(10_000).selectExpr(
        "CASE WHEN id % 100 < 99 THEN 'hot' ELSE concat('k', id % 7) END AS k",
        "id AS v",
    )
    plain = {
        (r.k): (r.n, r.s, r.mn)
        for r in df.groupBy("k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"), F.min("v").alias("mn"))
        .collect()
    }
    salted = {
        (r.k): (r.n, r.s, r.mn)
        for r in salted_agg(
            df, ["k"], {"n": ("v", "count"), "s": ("v", "sum"), "mn": ("v", "min")}
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    fact = spark.range(5_000).selectExpr("id % 10 AS k", "id AS v")
    dim = spark.range(10).selectExpr("id AS k", "concat('d', id) AS name")
    plain = sorted((r.k, r.v, r.name) for r in fact.join(dim, "k").collect())
    salted = sorted(
        (r.k, r.v, r.name) for r in salted_join(fact, dim, "k", salt_buckets=4).collect()
    )
    assert salted == plain


def test_bucketed_join_has_no_shuffle(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        a = spark.range(1_000).selectExpr("id AS k", "id * 2 AS va")
        b = spark.range(1_000).selectExpr("id AS k", "id * 3 AS vb")
        write_bucketed(a, "bucketed_a", ["k"], 8, sort_by=["k"])
        write_bucketed(b, "bucketed_b", ["k"], 8, sort_by=["k"])
        joined = read_table(spark, "bucketed_a").join(
            read_table(spark, "bucketed_b"), "k"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain()
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan  # co-located: no shuffle either side
        assert joined.count() == 1_000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS bucketed_a")
        spark.sql("DROP TABLE IF EXISTS bucketed_b")
