"""Tier XXXIX (rank statistics & robust trend): third-implementation
parity — pure-Python Spearman and Theil-Sen against the Spark plans."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF0001 = "/root/testdata/sf0.001"


def test_spearman_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics62 import (
        q_spearman_corr,
    )

    row = q_spearman_corr(spark, SF0001).collect()[0]

    li = spark.read.parquet(f"{SF0001}/lineitem.parquet")
    o = spark.read.parquet(f"{SF0001}/orders.parquet")
    lines = {}
    for r in li.select("l_orderkey").collect():
        lines[r.l_orderkey] = lines.get(r.l_orderkey, 0) + 1
    triples = [
        (r.o_orderkey, lines[r.o_orderkey], r.o_totalprice)
        for r in o.select("o_orderkey", "o_totalprice").collect()
        if r.o_orderkey in lines
    ]
    n = len(triples)
    rx = {
        k: i + 1
        for i, (k, x, y) in enumerate(
            sorted(triples, key=lambda t: (t[1], t[0]))
        )
    }
    ry = {
        k: i + 1
        for i, (k, x, y) in enumerate(
            sorted(triples, key=lambda t: (t[2], t[0]))
        )
    }
    sum_d2 = sum((rx[k] - ry[k]) ** 2 for k, _, _ in triples)
    assert row.n == n
    assert row.sum_d2 == sum_d2
    denom = n * (n * n - 1)
    assert row.rho == (denom - 6 * sum_d2) / denom


def test_mann_kendall_matches_pure_python(spark):
    import calendar

    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics62 import (
        q_mann_kendall_s,
    )

    row = q_mann_kendall_s(spark, SF0001).collect()[0]
    o = spark.read.parquet(f"{SF0001}/orders.parquet")
    daily = {}
    for r in o.select("o_orderdate", "o_totalprice").collect():
        day = calendar.timegm(r.o_orderdate.timetuple()) // 86_400
        daily[day] = daily.get(day, 0) + round(r.o_totalprice * 100)
    days = sorted(daily)
    s = n_pairs = 0
    for i, da in enumerate(days):
        for db in days[i + 1:]:
            n_pairs += 1
            d = daily[db] - daily[da]
            s += (d > 0) - (d < 0)
    assert (row.n_days, row.n_pairs, row.s) == (len(days), n_pairs, s)


def test_theil_sen_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics62 import (
        q_theil_sen_trend,
    )

    row = q_theil_sen_trend(spark, SF0001).collect()[0]

    o = spark.read.parquet(f"{SF0001}/orders.parquet")
    import calendar

    daily = {}
    for r in o.select("o_orderdate", "o_totalprice").collect():
        day = calendar.timegm(r.o_orderdate.timetuple()) // 86_400
        daily[day] = daily.get(day, 0) + round(r.o_totalprice * 100)
    days = sorted(daily)
    slopes = []
    for i, da in enumerate(days):
        for db in days[i + 1:]:
            num = daily[db] - daily[da]
            den = db - da
            slopes.append((num / den, num, den))
    slopes.sort()
    n_pairs = len(slopes)
    median = slopes[(n_pairs + 1) // 2 - 1][0]
    assert row.n_pairs == n_pairs
    assert row.median_slope_cents_per_day == median
