from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics45 import (
    q_autocorr_lag,
    q_gapfill_interpolate,
    q_hits_scores,
    q_tvd_drift_weekly,
)

SF0001 = "/root/testdata/sf0.001"


def test_hits_matches_pure_python_two_rounds(spark):
    rows = {r["p_partkey"]: r for r in q_hits_scores(spark, SF0001).collect()}
    edges = (
        load(spark, SF0001, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_hub: dict[int, set] = {}
    by_auth: dict[int, set] = {}
    for e in edges:
        by_hub.setdefault(e["l_orderkey"], set()).add(e["l_partkey"])
        by_auth.setdefault(e["l_partkey"], set()).add(e["l_orderkey"])
    auth1 = {p: len(hubs) for p, hubs in by_auth.items()}
    hub1 = {o: sum(auth1[p] for p in parts) for o, parts in by_hub.items()}
    auth2 = {p: sum(hub1[o] for o in hubs) for p, hubs in by_auth.items()}
    assert set(rows) == set(by_auth)
    for p, r in rows.items():
        assert r["auth1"] == auth1[p]
        assert r["auth2"] == auth2[p]


def test_autocorr_matches_pure_python(spark):
    import math

    row = q_autocorr_lag(spark, SF0001).collect()[0]
    daily = {
        r["day"]: int(r["rev_k"])
        for r in (
            load(spark, SF0001, "orders")
            .groupBy(F.col("o_orderdate").alias("day"))
            .agg(
                F.floor(
                    F.sum(F.col("o_totalprice").cast("decimal(30,8)")) / 1000
                )
                .cast("bigint")
                .alias("rev_k")
            )
            .collect()
        )
    }
    import datetime as dt

    pairs = [
        (x, daily[d - dt.timedelta(days=7)])
        for d, x in daily.items()
        if d - dt.timedelta(days=7) in daily
    ]
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    expected = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert row["n"] == n
    assert abs(row["autocorr"] - expected) < 1e-15
    assert -1.0 <= row["autocorr"] <= 1.0


def test_tvd_drift_bounds_and_reference(spark):
    rows = q_tvd_drift_weekly(spark, SF0001).collect()
    ev = (
        load(spark, SF0001, "events")
        .select(F.date_trunc("week", "ts").cast("date").alias("wk"), "event_type")
        .collect()
    )
    weekly: dict = {}
    for e in ev:
        weekly.setdefault(e["wk"], Counter())[e["event_type"]] += 1
    types = {e["event_type"] for e in ev}
    assert rows, "expected at least one adjacent-week pair"
    import datetime as dt

    for r in rows:
        cur = weekly[r["week_start"]]
        prev = weekly[r["week_start"] - dt.timedelta(days=7)]
        n, m = sum(cur.values()), sum(prev.values())
        expected = sum(
            abs(cur.get(t, 0) * m - prev.get(t, 0) * n) for t in types
        ) / (2 * n * m)
        assert abs(r["tvd"] - expected) < 1e-15
        assert 0.0 <= r["tvd"] <= 1.0
        # exact rational bookkeeping
        assert r["tvd_den"] == 2 * n * m


def test_interpolation_brackets_and_observed_rows(spark):
    rows = q_gapfill_interpolate(spark, SF0001).collect()
    by_series: dict = {}
    for r in rows:
        by_series.setdefault(r["event_type"], []).append(r)
    for series in by_series.values():
        series.sort(key=lambda r: r["hr"])
        observed = [
            (i, r["n_filled"]) for i, r in enumerate(series) if not r["interpolated"]
        ]
        assert observed, "each series must have observations"
        for i, r in enumerate(series):
            if not r["interpolated"]:
                assert r["n_filled"] == float(int(r["n_filled"]))
                continue
            prevs = [(j, v) for j, v in observed if j < i]
            nexts = [(j, v) for j, v in observed if j > i]
            if not prevs or not nexts:
                assert r["n_filled"] is None
                continue
            jp, vp = prevs[-1]
            jn, vn = nexts[0]
            expected = vp + (vn - vp) * ((i - jp) / (jn - jp))
            assert abs(r["n_filled"] - expected) < 1e-12
            lo, hi = min(vp, vn), max(vp, vn)
            assert lo - 1e-12 <= r["n_filled"] <= hi + 1e-12
