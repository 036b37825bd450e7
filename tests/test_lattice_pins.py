"""Round-11 integer-lattice value pins.

The r11 sweep (DESIGN §21 rule 3) rewrote ~70 money/measure
aggregates from double→DECIMAL casts onto exact integer lattices.
The DuckDB oracle proves Spark and DuckDB agree — but both sides now
share the SAME formulation, so the oracle alone cannot catch a
semantics slip introduced by the rewrite (e.g. a boundary double-
counted in the winsorized split, a descale applied twice).  These
pins re-derive each converted result in pure Python/pandas from the
raw parquet bytes and assert equality — an implementation-independent
third opinion.
"""

from __future__ import annotations

import math
import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF0001 = "/root/testdata/sf0.001"


def _tbl(name, cols):
    return pq.read_table(
        os.path.join(SF0001, f"{name}.parquet"), columns=cols
    ).to_pydict()


def _cents(x: float) -> int:
    # the engines' ROUND(x*100): 2-dp values land within ~4e-3 of an
    # integer, so any round-to-nearest agrees
    return int(round(x * 100))


def test_weighted_avg_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics20 import (
        q_weighted_avg,
    )

    li = _tbl("lineitem", ["l_partkey", "l_extendedprice", "l_discount"])
    part = _tbl("part", ["p_partkey", "p_brand"])
    brand = dict(zip(part["p_partkey"], part["p_brand"]))
    num: dict[str, int] = {}
    den: dict[str, int] = {}
    n: dict[str, int] = {}
    for pk, price, disc in zip(
        li["l_partkey"], li["l_extendedprice"], li["l_discount"]
    ):
        b = brand[pk]
        c, d = _cents(price), _cents(disc)
        num[b] = num.get(b, 0) + c * d
        den[b] = den.get(b, 0) + c
        n[b] = n.get(b, 0) + 1
    rows = {r["p_brand"]: r for r in q_weighted_avg(spark, SF0001).collect()}
    assert set(rows) == set(num)
    for b, r in rows.items():
        # the plan's exact float recipe over the same exact ints
        expected = (float(num[b]) / 10000.0) / (float(den[b]) / 100.0)
        assert r["wavg_discount"] == expected, (b, r["wavg_discount"], expected)
        assert r["n_lines"] == n[b]


def test_discount_depth_net_revenue_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics35 import (
        q_discount_depth,
    )

    li = _tbl("lineitem", ["l_extendedprice", "l_discount"])
    agg: dict[int, int] = {}
    for price, disc in zip(li["l_extendedprice"], li["l_discount"]):
        band = math.floor(disc * 100)
        agg[band] = agg.get(band, 0) + _cents(price) * (100 - _cents(disc))
    rows = {
        r["discount_pct"]: r["net_revenue"]
        for r in q_discount_depth(spark, SF0001).collect()
    }
    assert set(rows) == set(agg)
    for band, got in rows.items():
        assert got == float(agg[band]) / 10000.0, (band, got, agg[band])


def test_enrich_derived_item_total_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.rules_q import (
        q_enrich_derived,
    )

    # (l_orderkey, l_linenumber) is NOT unique in the testdata (the
    # dedup tier depends on duplicate keys), so pin the full-table
    # MULTISET of item_total values instead of a keyed lookup.
    li = _tbl("lineitem", ["l_extendedprice", "l_discount", "l_tax"])
    expected = sorted(
        float(_cents(p) * (100 - _cents(d)) * (100 + _cents(t))) / 1000000.0
        for p, d, t in zip(
            li["l_extendedprice"], li["l_discount"], li["l_tax"]
        )
    )
    got = sorted(
        r["item_total"] for r in q_enrich_derived(spark, SF0001).collect()
    )
    assert got == expected


def test_winsorized_mean_matches_numpy_clamp(spark):
    """The boundary-split formulation must equal the plain 'clamp
    then mean' definition: interior cents + n_lo*p05 + n_hi*p95 is
    algebraically sum(clamped).  numpy's linear-interpolation
    percentile is the same estimator quantile_cont/F.percentile use."""
    import numpy as np

    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics17 import (
        q_winsorized_mean,
    )

    cust = _tbl("customer", ["c_mktsegment", "c_acctbal"])
    by_seg: dict[str, list[int]] = {}
    for seg, bal in zip(cust["c_mktsegment"], cust["c_acctbal"]):
        by_seg.setdefault(seg, []).append(_cents(bal))
    rows = {
        r["c_mktsegment"]: r for r in q_winsorized_mean(spark, SF0001).collect()
    }
    assert set(rows) == set(by_seg)
    for seg, cents in by_seg.items():
        a = np.asarray(cents, dtype=np.float64)
        p05 = float(np.percentile(a, 5, method="linear"))
        p95 = float(np.percentile(a, 95, method="linear"))
        clamped = np.clip(a, p05, p95)
        expected = float(clamped.sum()) / 100.0 / len(cents)
        got = rows[seg]["winsorized_mean"]
        assert abs(got - expected) < 1e-9, (seg, got, expected)
        assert rows[seg]["n_customers"] == len(cents)


def test_time_weighted_avg_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics15 import (
        q_time_weighted_avg,
    )

    ev = _tbl("events", ["user_id", "event_id", "ts", "value"])
    per_user: dict = {}
    for u, e, ts, v in zip(
        ev["user_id"], ev["event_id"], ev["ts"], ev["value"]
    ):
        per_user.setdefault(u, []).append((ts, e, v))
    expected = {}
    for u, evs in per_user.items():
        evs.sort(key=lambda x: (x[0], x[1]))
        wsum100 = 0
        total = 0
        for (ts, _e, v), (ts2, _e2, _v2) in zip(evs, evs[1:]):
            dur = int(ts2.timestamp()) - int(ts.timestamp())
            wsum100 += _cents(v) * dur
            total += dur
        if total > 0:
            expected[u] = (total, float(wsum100) / 100.0 / float(total))
    rows = {
        r["user_id"]: (r["total_s"], r["twa_value"])
        for r in q_time_weighted_avg(spark, SF0001).collect()
    }
    assert rows == expected


def test_tpch_q6_matches_pure_python(spark):
    import datetime as dt

    from lakehouse_ecommerce_etl_pipeline_spark.plans.tpch import (
        q_tpch_q6_forecast_revenue,
    )

    li = _tbl("lineitem", ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
    lo, hi = dt.datetime(1996, 1, 1), dt.datetime(1997, 1, 1)
    acc = 0
    for ship, disc, qty, price in zip(
        li["l_shipdate"], li["l_discount"], li["l_quantity"], li["l_extendedprice"]
    ):
        s = ship.replace(tzinfo=None) if ship.tzinfo else ship
        if lo <= s < hi and 0.05 <= disc <= 0.07 and qty < 24:
            acc += _cents(price) * _cents(disc)
    got = q_tpch_q6_forecast_revenue(spark, SF0001).collect()[0]["revenue"]
    assert got == float(acc) / 10000.0


def test_anomaly_zscore_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.rules_q import (
        q_anomaly_zscore,
    )

    o = _tbl("orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    groups: dict = {}
    for ok, ck, price in zip(
        o["o_orderkey"], o["o_custkey"], o["o_totalprice"]
    ):
        groups.setdefault(ck, []).append((ok, price))
    expected = {}
    for ck, orders in groups.items():
        n = len(orders)
        if n <= 1:
            continue
        s = float(sum(_cents(p) for _ok, p in orders)) / 100.0
        ss = float(sum(_cents(p) * _cents(p) for _ok, p in orders)) / 10000.0
        var = (ss - s * s / n) / (n - 1)
        if not var > 0:
            continue
        std = math.sqrt(var)
        for ok, p in orders:
            z = (p - s / n) / std
            expected[ok] = round(z, 6)
    rows = {
        r["o_orderkey"]: r["zscore"]
        for r in q_anomaly_zscore(spark, SF0001).collect()
    }
    assert set(rows) == set(expected)
    for ok, z in rows.items():
        assert abs(z - expected[ok]) < 1e-9, (ok, z, expected[ok])


def test_incremental_agg_merge_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics8 import (
        q_incremental_agg_merge,
    )

    o = _tbl("orders", ["o_orderpriority", "o_totalprice"])
    agg: dict[str, list[int]] = {}
    for pri, price in zip(o["o_orderpriority"], o["o_totalprice"]):
        a = agg.setdefault(pri, [0, 0])
        a[0] += 1
        a[1] += _cents(price)
    rows = {
        r["o_orderpriority"]: (r["n_orders"], r["total_price"])
        for r in q_incremental_agg_merge(spark, SF0001).collect()
    }
    assert rows == {
        pri: (c, float(cents) / 100.0) for pri, (c, cents) in agg.items()
    }


def test_label_centroids_matches_pure_python(spark):
    """FLOOR(v*2^24) dyadic quantization: the scaling product is
    exact, FLOOR is tie-free, so the centroid must equal a pure-
    Python re-derivation bit-for-bit."""
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics19 import (
        q_label_centroids,
    )

    emb = _tbl("embeddings", ["label", "embedding"])
    acc: dict = {}
    for label, vec in zip(emb["label"], emb["embedding"]):
        for pos, v in enumerate(vec):
            k = (label, pos)
            s, n = acc.get(k, (0, 0))
            acc[k] = (s + math.floor(float(v) * 16777216), n + 1)
    rows = {
        (r["label"], r["pos"]): r["centroid"]
        for r in q_label_centroids(spark, SF0001).collect()
    }
    assert set(rows) == set(acc)
    for k, got in rows.items():
        s, n = acc[k]
        assert got == float(s) / 16777216.0 / float(n), (k, got)


def test_tpch_q3_top10_matches_pure_python(spark):
    """Revenue lattice through a 3-way join + top-10: per-order
    1e-4-unit sums re-derived in pure Python."""
    import datetime as dt

    from lakehouse_ecommerce_etl_pipeline_spark.plans.tpch import (
        q_tpch_q3_shipping_priority,
    )

    cust = _tbl("customer", ["c_custkey", "c_mktsegment"])
    building = {
        c for c, seg in zip(cust["c_custkey"], cust["c_mktsegment"])
        if seg == "BUILDING"
    }
    orders = _tbl("orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    cutoff = dt.datetime(1995, 3, 15)
    odate = {}
    for ok, ck, od in zip(
        orders["o_orderkey"], orders["o_custkey"], orders["o_orderdate"]
    ):
        d = od.replace(tzinfo=None) if od.tzinfo else od
        if ck in building and d < cutoff:
            odate[ok] = d
    li = _tbl("lineitem", ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"])
    rev4: dict = {}
    for ok, ship, p, disc in zip(
        li["l_orderkey"], li["l_shipdate"], li["l_extendedprice"], li["l_discount"]
    ):
        s = ship.replace(tzinfo=None) if ship.tzinfo else ship
        if ok in odate and s > cutoff:
            rev4[ok] = rev4.get(ok, 0) + _cents(p) * (100 - _cents(disc))
    top = sorted(
        ((float(r) / 10000.0, ok) for ok, r in rev4.items()),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    rows = q_tpch_q3_shipping_priority(spark, SF0001).collect()
    got = [(r["revenue"], r["l_orderkey"]) for r in rows]
    assert got == top


def test_gapfill_locf_hourly_sums_match_pure_python(spark):
    """The hourly cents sums feeding LOCF: re-derive observed buckets
    exactly; spot-check carried-forward gaps stay constant."""
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics9 import (
        q_gapfill_locf,
    )

    ev = _tbl("events", ["user_id", "ts", "value"])
    US_H = 3_600_000_000
    obs: dict = {}
    for u, ts, v in zip(ev["user_id"], ev["ts"], ev["value"]):
        h = (int(ts.timestamp()) * 1_000_000) // US_H
        key = (u, h)
        c, n = obs.get(key, (0, 0))
        obs[key] = (c + _cents(v), n + 1)
    rows = q_gapfill_locf(spark, SF0001).collect()
    by_key = {(r["user_id"], r["hour_bucket"]): r for r in rows}
    # every observed bucket appears with the exact cents sum
    for (u, h), (c, n) in obs.items():
        r = by_key[(u, h)]
        assert r["n_obs"] == n
        assert r["filled_value"] == float(c) / 100.0, (u, h)
    # gap rows carry the latest prior observed value
    last: dict = {}
    for (u, h) in sorted(by_key):
        r = by_key[(u, h)]
        if (u, h) in obs:
            last[u] = r["filled_value"]
        else:
            assert r["n_obs"] == 0
            assert r["filled_value"] == last[u], (u, h)


def test_gini_spend_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics21 import (
        q_gini_spend,
    )

    cust = _tbl("customer", ["c_custkey", "c_mktsegment"])
    seg = dict(zip(cust["c_custkey"], cust["c_mktsegment"]))
    orders = _tbl("orders", ["o_custkey", "o_totalprice"])
    spend_c: dict = {}
    for ck, p in zip(orders["o_custkey"], orders["o_totalprice"]):
        spend_c[ck] = spend_c.get(ck, 0) + _cents(p)
    per_seg: dict = {}
    for ck, c in spend_c.items():
        per_seg.setdefault(seg[ck], []).append((math.floor(c / 100), ck))
    rows = {r["c_mktsegment"]: r for r in q_gini_spend(spark, SF0001).collect()}
    assert set(rows) == set(per_seg)
    for s, items in per_seg.items():
        items.sort(key=lambda t: (t[0], t[1]))
        n = len(items)
        num = sum((2 * (i + 1) - n - 1) * x for i, (x, _ck) in enumerate(items))
        den = n * sum(x for x, _ck in items)
        expected = float(num) / float(den)
        assert abs(rows[s]["gini"] - expected) < 1e-12, (s,)
        assert rows[s]["n_customers"] == n


def test_trailing_zscore_flags_match_pure_python(spark):
    """The homogeneous-degree-2 inequality on the cents lattice must
    reproduce the brute-force trailing-window flag set exactly."""
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics23 import (
        q_trailing_zscore_anomaly,
    )

    ev = _tbl("events", ["event_id", "user_id", "ts", "value"])
    per_user: dict = {}
    for e, u, ts, v in zip(
        ev["event_id"], ev["user_id"], ev["ts"], ev["value"]
    ):
        per_user.setdefault(u, []).append((ts, e, _cents(v)))
    expected = set()
    exp_winsum = {}
    for u, evs in per_user.items():
        evs.sort(key=lambda x: (x[0], x[1]))
        for i, (_ts, e, c) in enumerate(evs):
            win = [cc for _t, _e, cc in evs[max(0, i - 20):i]]
            n = len(win)
            if n < 10:
                continue
            s = sum(win)
            ssq = sum(x * x for x in win)
            if (n * c - s) ** 2 > 9 * (n * ssq - s * s):
                expected.add(e)
                exp_winsum[e] = float(s) / 100.0
    rows = {r["event_id"]: r for r in q_trailing_zscore_anomaly(spark, SF0001).collect()}
    assert set(rows) == expected
    for e, r in rows.items():
        assert r["win_sum"] == exp_winsum[e]


def test_winsorized_mean_degenerate_segment_is_bound(spark, tmp_path):
    """r11 ADVICE item 1: with p05 == p95 (constant-ish segment) the
    clamp-then-mean definition collapses to the bound itself.  The old
    boundary split counted a value equal to BOTH bounds in n_lo AND
    n_hi, inflating the mean; the disjoint-tail form must return the
    bound exactly.  Synthetic table because the shipped testdata has
    no degenerate segment — the oracle shares the formulation and is
    structurally blind to this."""
    import pandas as pd

    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics17 import (
        q_winsorized_mean,
    )

    df = pd.DataFrame(
        {
            "c_mktsegment": ["CONST"] * 7 + ["NORMAL"] * 100,
            "c_acctbal": [42.00] * 7 + [float(i) for i in range(100)],
        }
    )
    spark.createDataFrame(df).write.parquet(str(tmp_path / "customer.parquet"))
    rows = {
        r["c_mktsegment"]: r
        for r in q_winsorized_mean(spark, str(tmp_path)).collect()
    }
    assert rows["CONST"]["winsorized_mean"] == 42.00
    assert rows["CONST"]["n_customers"] == 7
    # the non-degenerate segment still matches the numpy clamp
    import numpy as np

    a = np.arange(100, dtype=np.float64) * 100.0  # cents
    p05, p95 = np.percentile(a, [5, 95], method="linear")
    exp = float(np.clip(a, p05, p95).sum()) / 100.0 / 100.0
    assert abs(rows["NORMAL"]["winsorized_mean"] - exp) < 1e-9


# --- r12 additions: pins for the r13 re-certification queue's TPC-H
# rows (both-sides lattice rewrites the oracle is structurally blind
# to).  One pin per arithmetic SHAPE: join-revenue (q5), multi-term
# product (q9), conditional ratio (q14), integer threshold-avg (q17),
# having-sum (q18); q3/q6 were pinned in r11.  All dims are
# unique-keyed in the testdata (verified), so dict joins are exact.


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def _rev_units(p, d):
    return _cents(p) * (100 - _cents(d))


def test_tpch_q5_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.tpch import (
        q_tpch_q5_local_supplier,
    )

    li = _tbl("lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    o = _tbl("orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    c = _tbl("customer", ["c_custkey", "c_nationkey"])
    s = _tbl("supplier", ["s_suppkey", "s_nationkey"])
    n = _tbl("nation", ["n_nationkey", "n_name", "n_regionkey"])
    r = _tbl("region", ["r_regionkey", "r_name"])
    lo, hi = _ts("1996-01-01"), _ts("1997-01-01")
    omap = {
        k: cust
        for k, cust, d in zip(o["o_orderkey"], o["o_custkey"], o["o_orderdate"])
        if lo <= d < hi
    }
    cmap = dict(zip(c["c_custkey"], c["c_nationkey"]))
    smap = dict(zip(s["s_suppkey"], s["s_nationkey"]))
    nmap = {k: (nm, rk) for k, nm, rk in zip(n["n_nationkey"], n["n_name"], n["n_regionkey"])}
    asia = {k for k, nm in zip(r["r_regionkey"], r["r_name"]) if nm == "ASIA"}
    units: dict[str, int] = {}
    for ok, sk, p, d in zip(
        li["l_orderkey"], li["l_suppkey"], li["l_extendedprice"], li["l_discount"]
    ):
        cust = omap.get(ok)
        if cust is None:
            continue
        cn = cmap[cust]
        if smap.get(sk) != cn:
            continue
        nm, rk = nmap[cn]
        if rk not in asia:
            continue
        units[nm] = units.get(nm, 0) + _rev_units(p, d)
    rows = {x["n_name"]: x["revenue"] for x in q_tpch_q5_local_supplier(spark, SF0001).collect()}
    assert rows == {nm: float(u) / 10000.0 for nm, u in units.items()}


def test_tpch_q9_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.tpch3 import (
        q_tpch_q9_product_profit,
    )

    li = _tbl(
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    s = _tbl("supplier", ["s_suppkey", "s_nationkey"])
    n = _tbl("nation", ["n_nationkey", "n_name"])
    p = _tbl("part", ["p_partkey", "p_name", "p_retailprice"])
    o = _tbl("orders", ["o_orderkey", "o_orderdate"])
    smap = dict(zip(s["s_suppkey"], s["s_nationkey"]))
    nmap = dict(zip(n["n_nationkey"], n["n_name"]))
    pmap = {
        k: rp
        for k, nm, rp in zip(p["p_partkey"], p["p_name"], p["p_retailprice"])
        if "red" in nm
    }
    omap = dict(zip(o["o_orderkey"], o["o_orderdate"]))
    units: dict[tuple, int] = {}
    for ok, sk, pk, q, ep, d in zip(
        li["l_orderkey"], li["l_suppkey"], li["l_partkey"],
        li["l_quantity"], li["l_extendedprice"], li["l_discount"],
    ):
        rp = pmap.get(pk)
        if rp is None:
            continue
        key = (nmap[smap[sk]], omap[ok].year)
        profit = _rev_units(ep, d) - _cents(rp) * 100 * int(q)
        units[key] = units.get(key, 0) + profit
    rows = q_tpch_q9_product_profit(spark, SF0001).collect()
    got = {(x["nation"], x["o_year"]): x["sum_profit"] for x in rows}
    assert got == {k: float(u) / 10000.0 for k, u in units.items()}
    # ordering contract: nation asc, year desc
    assert [(x["nation"], x["o_year"]) for x in rows] == sorted(
        got, key=lambda k: (k[0], -k[1])
    )


def test_tpch_q14_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.tpch2 import (
        q_tpch_q14_promo_share,
    )

    li = _tbl("lineitem", ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"])
    p = _tbl("part", ["p_partkey", "p_type"])
    ptype = dict(zip(p["p_partkey"], p["p_type"]))
    lo, hi = _ts("1996-09-01"), _ts("1996-10-01")
    promo = total = 0
    for pk, sd, ep, d in zip(
        li["l_partkey"], li["l_shipdate"], li["l_extendedprice"], li["l_discount"]
    ):
        if not (lo <= sd < hi) or pk not in ptype:
            continue
        u = _rev_units(ep, d)
        total += u
        if ptype[pk] == "PROMO":
            promo += u
    expected = 100.0 * float(promo) / float(total)
    got = q_tpch_q14_promo_share(spark, SF0001).collect()[0]["promo_revenue_pct"]
    assert got == expected


def test_tpch_q17_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.tpch3 import (
        q_tpch_q17_small_quantity_revenue,
    )

    li = _tbl("lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
    p = _tbl("part", ["p_partkey", "p_brand"])
    brand = {k for k, b in zip(p["p_partkey"], p["p_brand"]) if b == "Brand#13"}
    stats: dict[int, list[int]] = {}
    rows = [
        (pk, int(q), ep)
        for pk, q, ep in zip(li["l_partkey"], li["l_quantity"], li["l_extendedprice"])
        if pk in brand
    ]
    for pk, q, _ in rows:
        s = stats.setdefault(pk, [0, 0])
        s[0] += q
        s[1] += 1
    cents_sum = sum(
        _cents(ep) for pk, q, ep in rows if q * 5 * stats[pk][1] < stats[pk][0]
    )
    expected = float(cents_sum) / 100.0 / 7.0
    got = q_tpch_q17_small_quantity_revenue(spark, SF0001).collect()[0]["avg_yearly"]
    assert got == expected


def test_tpch_q18_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.tpch2 import (
        q_tpch_q18_large_volume,
    )

    li = _tbl("lineitem", ["l_orderkey", "l_quantity"])
    o = _tbl("orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    c = _tbl("customer", ["c_custkey", "c_name"])
    qty: dict[int, int] = {}
    for ok, q in zip(li["l_orderkey"], li["l_quantity"]):
        qty[ok] = qty.get(ok, 0) + int(q)
    cmap = dict(zip(c["c_custkey"], c["c_name"]))
    expected = {}
    for ok, ck, od, tp in zip(
        o["o_orderkey"], o["o_custkey"], o["o_orderdate"], o["o_totalprice"]
    ):
        q = qty.get(ok, 0)
        if q > 120:
            expected[(ck, cmap[ck], ok, od, tp)] = float(q)
    got = {
        (x["c_custkey"], x["c_name"], x["o_orderkey"], x["o_orderdate"], x["o_totalprice"]): x["total_qty"]
        for x in q_tpch_q18_large_volume(spark, SF0001).collect()
    }
    assert got == expected


def test_stream_tumbling_agg_matches_pure_python(spark):
    """Pin for the r13-queue streaming rows' shared converted shape:
    the cents-lattice tumbling sum (streaming/windows.py dsum helper,
    r11 sweep).  Re-derives hourly (window_start, event_type) counts
    and cents sums from raw parquet bytes and compares the DRAINED
    STREAM — subsumes the existing stream/batch parity test with an
    implementation-independent third opinion."""
    from lakehouse_ecommerce_etl_pipeline_spark.plans.streaming_q import (
        q_stream_tumbling_agg,
    )

    ev = _tbl("events", ["ts", "event_type", "value"])
    agg: dict[tuple, list[int]] = {}
    for ts, et, v in zip(ev["ts"], ev["event_type"], ev["value"]):
        key = (ts.replace(minute=0, second=0, microsecond=0), et)
        s = agg.setdefault(key, [0, 0])
        s[0] += 1
        s[1] += _cents(v)
    rows = q_stream_tumbling_agg(spark, SF0001).collect()
    got = {
        (x["window_start"], x["event_type"]): (x["n_events"], x["sum_value"])
        for x in rows
    }
    assert got == {
        k: (n, float(c) / 100.0) for k, (n, c) in agg.items()
    }


def test_tpch_q10_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.tpch import (
        q_tpch_q10_returned_items,
    )

    li = _tbl("lineitem", ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"])
    o = _tbl("orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    c = _tbl("customer", ["c_custkey", "c_name", "c_nationkey"])
    n = _tbl("nation", ["n_nationkey", "n_name"])
    lo, hi = _ts("1996-10-01"), _ts("1997-01-01")
    omap = {
        k: cust
        for k, cust, d in zip(o["o_orderkey"], o["o_custkey"], o["o_orderdate"])
        if lo <= d < hi
    }
    cmap = {k: (nm, nk) for k, nm, nk in zip(c["c_custkey"], c["c_name"], c["c_nationkey"])}
    nmap = dict(zip(n["n_nationkey"], n["n_name"]))
    units: dict[tuple, int] = {}
    for ok, rf, ep, d in zip(
        li["l_orderkey"], li["l_returnflag"], li["l_extendedprice"], li["l_discount"]
    ):
        if rf != "R":
            continue
        cust = omap.get(ok)
        if cust is None:
            continue
        nm, nk = cmap[cust]
        key = (cust, nm, nmap[nk])
        units[key] = units.get(key, 0) + _rev_units(ep, d)
    expected = sorted(
        (
            (ck, cn, float(u) / 10000.0, nn)
            for (ck, cn, nn), u in units.items()
        ),
        key=lambda r: (-r[2], r[0]),
    )[:20]
    got = [
        (x["c_custkey"], x["c_name"], x["revenue"], x["n_name"])
        for x in q_tpch_q10_returned_items(spark, SF0001).collect()
    ]
    assert got == expected


def test_tpch_q11_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.tpch3 import (
        q_tpch_q11_important_value_share,
    )

    li = _tbl("lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])
    s = _tbl("supplier", ["s_suppkey", "s_nationkey"])
    n = _tbl("nation", ["n_nationkey", "n_name"])
    smap = dict(zip(s["s_suppkey"], s["s_nationkey"]))
    nmap = dict(zip(n["n_nationkey"], n["n_name"]))
    val: dict[str, int] = {}
    for sk, ep, d in zip(li["l_suppkey"], li["l_extendedprice"], li["l_discount"]):
        nm = nmap[smap[sk]]
        val[nm] = val.get(nm, 0) + _rev_units(ep, d)
    total = sum(val.values())
    expected = sorted(
        ((nm, float(u) / 10000.0) for nm, u in val.items() if u * 25 > total),
        key=lambda r: (-r[1], r[0]),
    )
    got = [
        (x["n_name"], x["value"])
        for x in q_tpch_q11_important_value_share(spark, SF0001).collect()
    ]
    assert got == expected


def test_tpch_q22_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.tpch3 import (
        q_tpch_q22_idle_customers,
    )

    c = _tbl("customer", ["c_custkey", "c_acctbal", "c_nationkey"])
    n = _tbl("nation", ["n_nationkey", "n_name"])
    o = _tbl("orders", ["o_custkey", "o_orderpriority"])
    urgent = {
        ck for ck, pr in zip(o["o_custkey"], o["o_orderpriority"]) if pr == "1-URGENT"
    }
    pos = [_cents(b) for b in c["c_acctbal"] if b > 0]
    threshold = float(sum(pos)) / 100.0 / len(pos)
    nmap = dict(zip(n["n_nationkey"], n["n_name"]))
    agg: dict[str, list[int]] = {}
    for ck, b, nk in zip(c["c_custkey"], c["c_acctbal"], c["c_nationkey"]):
        if b > threshold and ck not in urgent:
            s = agg.setdefault(nmap[nk], [0, 0])
            s[0] += 1
            s[1] += _cents(b)
    expected = [
        (nm, agg[nm][0], float(agg[nm][1]) / 100.0) for nm in sorted(agg)
    ]
    got = [
        (x["nation"], x["numcust"], x["totacctbal"])
        for x in q_tpch_q22_idle_customers(spark, SF0001).collect()
    ]
    assert got == expected


def test_tpch_q7_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.tpch2 import (
        q_tpch_q7_nation_volume,
    )

    li = _tbl(
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    o = _tbl("orders", ["o_orderkey", "o_custkey"])
    c = _tbl("customer", ["c_custkey", "c_nationkey"])
    s = _tbl("supplier", ["s_suppkey", "s_nationkey"])
    n = _tbl("nation", ["n_nationkey", "n_name"])
    omap = dict(zip(o["o_orderkey"], o["o_custkey"]))
    cmap = dict(zip(c["c_custkey"], c["c_nationkey"]))
    smap = dict(zip(s["s_suppkey"], s["s_nationkey"]))
    nmap = dict(zip(n["n_nationkey"], n["n_name"]))
    units: dict[tuple, int] = {}
    for ok, sk, sd, ep, d in zip(
        li["l_orderkey"], li["l_suppkey"], li["l_shipdate"],
        li["l_extendedprice"], li["l_discount"],
    ):
        sn, cn = nmap[smap[sk]], nmap[cmap[omap[ok]]]
        if (sn, cn) not in {("NATION_0", "NATION_1"), ("NATION_1", "NATION_0")}:
            continue
        key = (sn, cn, sd.year)
        units[key] = units.get(key, 0) + _rev_units(ep, d)
    got = {
        (x["supp_nation"], x["cust_nation"], x["l_year"]): x["revenue"]
        for x in q_tpch_q7_nation_volume(spark, SF0001).collect()
    }
    assert got == {k: float(u) / 10000.0 for k, u in units.items()}


def test_tpch_q8_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.tpch3 import (
        q_tpch_q8_market_share,
    )

    li = _tbl(
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_partkey", "l_extendedprice", "l_discount"],
    )
    o = _tbl("orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    c = _tbl("customer", ["c_custkey", "c_nationkey"])
    s = _tbl("supplier", ["s_suppkey", "s_nationkey"])
    n = _tbl("nation", ["n_nationkey", "n_name", "n_regionkey"])
    p = _tbl("part", ["p_partkey", "p_type"])
    lo, hi = _ts("1996-01-01"), _ts("1998-01-01")
    omap = {
        k: (cust, d.year)
        for k, cust, d in zip(o["o_orderkey"], o["o_custkey"], o["o_orderdate"])
        if lo <= d < hi
    }
    cmap = dict(zip(c["c_custkey"], c["c_nationkey"]))
    smap = dict(zip(s["s_suppkey"], s["s_nationkey"]))
    nmap = dict(zip(n["n_nationkey"], n["n_name"]))
    region2 = {k for k, rk in zip(n["n_nationkey"], n["n_regionkey"]) if rk == 2}
    econ = {k for k, t in zip(p["p_partkey"], p["p_type"]) if t == "ECONOMY"}
    num: dict[int, int] = {}
    den: dict[int, int] = {}
    for ok, sk, pk, ep, d in zip(
        li["l_orderkey"], li["l_suppkey"], li["l_partkey"],
        li["l_extendedprice"], li["l_discount"],
    ):
        ent = omap.get(ok)
        if ent is None or pk not in econ or cmap[ent[0]] not in region2:
            continue
        yr = ent[1]
        u = _rev_units(ep, d)
        den[yr] = den.get(yr, 0) + u
        if nmap[smap[sk]] == "NATION_7":
            num[yr] = num.get(yr, 0) + u
    rows = q_tpch_q8_market_share(spark, SF0001).collect()
    got = [(x["o_year"], x["mkt_share"]) for x in rows]
    expected = sorted(
        (yr, float(num.get(yr, 0)) / float(dv)) for yr, dv in den.items()
    )
    assert got == expected


def test_tpch_q15_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.tpch3 import (
        q_tpch_q15_top_supplier,
    )

    li = _tbl("lineitem", ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"])
    s = _tbl("supplier", ["s_suppkey", "s_name"])
    lo, hi = _ts("1996-01-01"), _ts("1996-04-01")
    rev: dict[int, int] = {}
    for sk, sd, ep, d in zip(
        li["l_suppkey"], li["l_shipdate"], li["l_extendedprice"], li["l_discount"]
    ):
        if lo <= sd < hi:
            rev[sk] = rev.get(sk, 0) + _rev_units(ep, d)
    best = max(rev.values())
    smap = dict(zip(s["s_suppkey"], s["s_name"]))
    expected = sorted(
        (sk, smap[sk], float(u) / 10000.0) for sk, u in rev.items() if u == best
    )
    got = [
        (x["s_suppkey"], x["s_name"], x["total_revenue"])
        for x in q_tpch_q15_top_supplier(spark, SF0001).collect()
    ]
    assert got == expected


def test_tpch_q19_matches_pure_python(spark):
    # pinned at sf0.01: the sf0.001 slice matches ZERO rows of the
    # disjunctive predicate (SUM → NULL on both engines — asserted
    # below anyway), while sf0.01 selects 131 lineitems, exercising
    # the lattice sum itself
    import os

    sf001 = "/root/testdata/sf0.01"

    def _tbl01(name, cols):
        import pyarrow.parquet as _pq

        return _pq.read_table(
            os.path.join(sf001, f"{name}.parquet"), columns=cols
        ).to_pydict()

    from lakehouse_ecommerce_etl_pipeline_spark.plans.tpch2 import (
        q_tpch_q19_brand_revenue,
    )

    li = _tbl01("lineitem", ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
    p = _tbl01("part", ["p_partkey", "p_brand", "p_size"])
    pmap = {k: (b, sz) for k, b, sz in zip(p["p_partkey"], p["p_brand"], p["p_size"])}
    total = None
    for pk, q, ep, d in zip(
        li["l_partkey"], li["l_quantity"], li["l_extendedprice"], li["l_discount"]
    ):
        b, sz = pmap[pk]
        if (
            (b == "Brand#12" and 1 <= sz <= 5 and 1 <= q <= 11)
            or (b == "Brand#23" and 1 <= sz <= 10 and 10 <= q <= 20)
            or (b == "Brand#34" and 1 <= sz <= 15 and 20 <= q <= 30)
        ):
            total = (total or 0) + _rev_units(ep, d)
    got = q_tpch_q19_brand_revenue(spark, sf001).collect()[0]["revenue"]
    assert total is not None  # sf0.01 selects 131 lineitems
    assert got == float(total) / 10000.0
    # and the empty slice agrees on SQL NULL semantics at sf0.001
    assert q_tpch_q19_brand_revenue(spark, SF0001).collect()[0]["revenue"] is None


def test_tpch_q20_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.tpch4 import (
        q_tpch_q20_heavy_shippers,
    )

    li = _tbl("lineitem", ["l_suppkey", "l_partkey", "l_shipdate", "l_quantity"])
    p = _tbl("part", ["p_partkey", "p_name"])
    s = _tbl("supplier", ["s_suppkey", "s_name", "s_nationkey"])
    n = _tbl("nation", ["n_nationkey", "n_name", "n_regionkey"])
    red = {k for k, nm in zip(p["p_partkey"], p["p_name"]) if nm.startswith("red")}
    lo, hi = _ts("1997-01-01"), _ts("1998-01-01")
    qty: dict[int, int] = {}
    for sk, pk, sd, q in zip(
        li["l_suppkey"], li["l_partkey"], li["l_shipdate"], li["l_quantity"]
    ):
        if pk in red and lo <= sd < hi:
            qty[sk] = qty.get(sk, 0) + int(q)
    heavy = {sk for sk, q in qty.items() if q > 50}
    nmap = {
        k: nm
        for k, nm, rk in zip(n["n_nationkey"], n["n_name"], n["n_regionkey"])
        if rk == 1
    }
    expected = sorted(
        (nm, nmap[nk])
        for sk, nm, nk in zip(s["s_suppkey"], s["s_name"], s["s_nationkey"])
        if nk in nmap and sk in heavy
    )
    got = [
        (x["s_name"], x["nation"])
        for x in q_tpch_q20_heavy_shippers(spark, SF0001).collect()
    ]
    assert got == expected


def test_stream_sliding_agg_matches_pure_python(spark):
    """2 h windows sliding hourly: every event lands in exactly the
    two hour-aligned windows [trunc(ts)-1h, trunc(ts)]."""
    import datetime

    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics25 import (
        q_stream_sliding_agg,
    )

    ev = _tbl("events", ["ts", "event_type", "value"])
    agg: dict[tuple, list[int]] = {}
    for ts, et, v in zip(ev["ts"], ev["event_type"], ev["value"]):
        h = ts.replace(minute=0, second=0, microsecond=0)
        for ws in (h, h - datetime.timedelta(hours=1)):
            s = agg.setdefault((ws, et), [0, 0])
            s[0] += 1
            s[1] += _cents(v)
    got = {
        (x["window_start"], x["event_type"]): (x["n_events"], x["sum_value"])
        for x in q_stream_sliding_agg(spark, SF0001).collect()
    }
    assert got == {k: (n, float(c) / 100.0) for k, (n, c) in agg.items()}


def test_stream_session_window_matches_pure_python(spark):
    """30-min-gap sessionization: a gap >= 30 min starts a new island;
    session end = last event + gap (session_window semantics)."""
    import datetime

    from lakehouse_ecommerce_etl_pipeline_spark.plans.streaming_q import (
        q_stream_session_window,
    )

    ev = _tbl("events", ["user_id", "ts", "value"])
    by_user: dict[int, list] = {}
    for u, ts, v in zip(ev["user_id"], ev["ts"], ev["value"]):
        by_user.setdefault(u, []).append((ts, v))
    gap = datetime.timedelta(minutes=30)
    expected = set()
    for u, rows in by_user.items():
        rows.sort(key=lambda r: r[0])
        cur: list = []
        for ts, v in rows:
            if cur and ts - cur[-1][0] >= gap:
                expected.add(
                    (u, cur[0][0], cur[-1][0] + gap, len(cur),
                     float(sum(_cents(x[1]) for x in cur)) / 100.0)
                )
                cur = []
            cur.append((ts, v))
        expected.add(
            (u, cur[0][0], cur[-1][0] + gap, len(cur),
             float(sum(_cents(x[1]) for x in cur)) / 100.0)
        )
    got = {
        (x["user_id"], x["session_start"], x["session_end"],
         x["n_events"], x["sum_value"])
        for x in q_stream_session_window(spark, SF0001).collect()
    }
    assert got == expected


def test_stream_static_join_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.streaming_q import (
        q_stream_static_join,
    )

    ev = _tbl("events", ["user_id", "value"])
    c = _tbl("customer", ["c_custkey", "c_mktsegment"])
    seg = dict(zip(c["c_custkey"], c["c_mktsegment"]))
    agg: dict[str, list[int]] = {}
    for u, v in zip(ev["user_id"], ev["value"]):
        if u in seg:
            s = agg.setdefault(seg[u], [0, 0])
            s[0] += 1
            s[1] += _cents(v)
    got = {
        x["c_mktsegment"]: (x["n_events"], x["sum_value"])
        for x in q_stream_static_join(spark, SF0001).collect()
    }
    assert got == {k: (n, float(c_) / 100.0) for k, (n, c_) in agg.items()}


def test_batch_session_window_matches_pure_python(spark):
    """Native session_window (20-min gap, BATCH): a gap strictly
    greater than 20 min starts a new island; end = last + gap."""
    import datetime

    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics25 import (
        q_batch_session_window,
    )

    ev = _tbl("events", ["user_id", "event_id", "ts", "value"])
    by_user: dict[int, list] = {}
    for u, eid, ts, v in zip(
        ev["user_id"], ev["event_id"], ev["ts"], ev["value"]
    ):
        by_user.setdefault(u, []).append((ts, eid, v))
    gap = datetime.timedelta(minutes=20)
    expected = set()
    for u, rows in by_user.items():
        rows.sort(key=lambda r: (r[0], r[1]))
        cur: list = []
        for ts, _eid, v in rows:
            if cur and ts - cur[-1][0] > gap:
                expected.add(
                    (u, cur[0][0], cur[-1][0] + gap, len(cur),
                     float(sum(_cents(x[1]) for x in cur)) / 100.0)
                )
                cur = []
            cur.append((ts, v))
        expected.add(
            (u, cur[0][0], cur[-1][0] + gap, len(cur),
             float(sum(_cents(x[1]) for x in cur)) / 100.0)
        )
    got = {
        (x["user_id"], x["session_start"], x["session_end"],
         x["n_events"], x["sum_value"])
        for x in q_batch_session_window(spark, SF0001).collect()
    }
    assert got == expected


# --- bench-visible r13-queue rows (VERDICT r11 priority list):
# q_groupby_agg / q_star_join / q_cube / q_window_frame /
# q_events_window_agg, plus the rollup/grouping-sets family and the
# pandas-UDAF faces that share the same converted dsum/cents shape.


def test_groupby_agg_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics import (
        q_groupby_agg,
    )

    li = _tbl(
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_shipdate", "l_quantity",
         "l_extendedprice", "l_discount"],
    )
    cut = _ts("1998-09-02")
    agg: dict[tuple, list[int]] = {}
    for rf, ls, sd, q, ep, d in zip(
        li["l_returnflag"], li["l_linestatus"], li["l_shipdate"],
        li["l_quantity"], li["l_extendedprice"], li["l_discount"],
    ):
        if sd > cut:
            continue
        s = agg.setdefault((rf, ls), [0, 0, 0, 0])
        s[0] += _cents(q)
        s[1] += _cents(ep)
        s[2] += _cents(ep) * (100 - _cents(d))
        s[3] += 1
    got = {
        (x["l_returnflag"], x["l_linestatus"]): (
            x["sum_qty"], x["sum_base_price"], x["sum_disc_price"],
            x["avg_qty"], x["count_order"],
        )
        for x in q_groupby_agg(spark, SF0001).collect()
    }
    assert got == {
        k: (
            float(cq) / 100.0,
            float(cp) / 100.0,
            float(cd) / 10000.0,
            float(cq) / 100.0 / n,
            n,
        )
        for k, (cq, cp, cd, n) in agg.items()
    }


def test_star_join_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics import (
        q_star_join,
    )

    o = _tbl("orders", ["o_custkey", "o_totalprice"])
    c = _tbl("customer", ["c_custkey", "c_nationkey"])
    n = _tbl("nation", ["n_nationkey", "n_name", "n_regionkey"])
    r = _tbl("region", ["r_regionkey", "r_name"])
    cmap = dict(zip(c["c_custkey"], c["c_nationkey"]))
    nmap = {k: (nm, rk) for k, nm, rk in zip(n["n_nationkey"], n["n_name"], n["n_regionkey"])}
    rmap = dict(zip(r["r_regionkey"], r["r_name"]))
    agg: dict[tuple, list[int]] = {}
    for ck, tp in zip(o["o_custkey"], o["o_totalprice"]):
        nm, rk = nmap[cmap[ck]]
        s = agg.setdefault((rmap[rk], nm), [0, 0])
        s[0] += _cents(tp)
        s[1] += 1
    got = {
        (x["r_name"], x["n_name"]): (x["revenue"], x["n_orders"])
        for x in q_star_join(spark, SF0001).collect()
    }
    assert got == {k: (float(cts) / 100.0, n_) for k, (cts, n_) in agg.items()}


def _grouping_levels(rows, keyfns):
    """Aggregate (cents, count) under each grouping-set key fn."""
    out = {}
    for kf in keyfns:
        for key_vals, cts in rows:
            k = kf(key_vals)
            s = out.setdefault(k, [0, 0])
            s[0] += cts
            s[1] += 1
    return out


def test_rollup_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics import (
        q_rollup,
    )

    li = _tbl("lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
    rows = [((rf, ls), _cents(q)) for rf, ls, q in zip(
        li["l_returnflag"], li["l_linestatus"], li["l_quantity"])]
    agg = _grouping_levels(
        rows,
        [lambda k: (k[0], k[1]), lambda k: (k[0], None), lambda k: (None, None)],
    )
    got = {
        (x["l_returnflag"], x["l_linestatus"]): (x["sum_qty"], x["n_rows"])
        for x in q_rollup(spark, SF0001).collect()
    }
    assert got == {k: (float(c) / 100.0, n) for k, (c, n) in agg.items()}


def test_cube_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics import q_cube

    o = _tbl("orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])
    rows = [((st, pr), _cents(tp)) for st, pr, tp in zip(
        o["o_orderstatus"], o["o_orderpriority"], o["o_totalprice"])]
    agg = _grouping_levels(
        rows,
        [
            lambda k: (k[0], k[1]),
            lambda k: (k[0], None),
            lambda k: (None, k[1]),
            lambda k: (None, None),
        ],
    )
    got = {
        (x["o_orderstatus"], x["o_orderpriority"]): (x["sum_price"], x["n_rows"])
        for x in q_cube(spark, SF0001).collect()
    }
    assert got == {k: (float(c) / 100.0, n) for k, (c, n) in agg.items()}


def test_grouping_sets_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics import (
        q_grouping_sets,
    )

    o = _tbl("orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])
    rows = [((st, pr), _cents(tp)) for st, pr, tp in zip(
        o["o_orderstatus"], o["o_orderpriority"], o["o_totalprice"])]
    agg = _grouping_levels(
        rows, [lambda k: (k[0], None), lambda k: (None, k[1])]
    )
    got = {
        (x["o_orderstatus"], x["o_orderpriority"]): (x["n_rows"], x["sum_price"])
        for x in q_grouping_sets(spark, SF0001).collect()
    }
    assert got == {k: (n, float(c) / 100.0) for k, (c, n) in agg.items()}


def test_window_frame_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics import (
        q_window_frame,
    )

    ev = _tbl("events", ["event_id", "user_id", "ts", "value"])
    by_user: dict[int, list] = {}
    for eid, u, ts, v in zip(ev["event_id"], ev["user_id"], ev["ts"], ev["value"]):
        by_user.setdefault(u, []).append((ts, eid, v))
    expected = {}
    for u, rows in by_user.items():
        rows.sort(key=lambda r: (r[0], r[1]))
        run = 0
        for ts, eid, v in rows:
            run += _cents(v)
            expected[eid] = float(run) / 100.0
    got = {
        x["event_id"]: x["running_sum"]
        for x in q_window_frame(spark, SF0001).collect()
    }
    assert got == expected


def test_events_window_agg_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics import (
        q_events_window_agg,
    )

    ev = _tbl("events", ["ts", "event_type", "value"])
    agg: dict[tuple, list[int]] = {}
    for ts, et, v in zip(ev["ts"], ev["event_type"], ev["value"]):
        s = agg.setdefault((ts.replace(minute=0, second=0, microsecond=0), et), [0, 0])
        s[0] += 1
        s[1] += _cents(v)
    got = {
        (x["window_start"], x["event_type"]): (x["n_events"], x["sum_value"])
        for x in q_events_window_agg(spark, SF0001).collect()
    }
    assert got == {k: (n, float(c) / 100.0) for k, (n, c) in agg.items()}


def test_pandas_udaf_agg_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.sources_q import (
        q_pandas_udaf_agg,
    )

    o = _tbl("orders", ["o_orderpriority", "o_totalprice"])
    agg: dict[str, list[int]] = {}
    for pr, tp in zip(o["o_orderpriority"], o["o_totalprice"]):
        s = agg.setdefault(pr, [0, 0])
        s[0] += _cents(tp)
        s[1] += 1
    got = {
        x["o_orderpriority"]: (x["total_cents"], x["n_orders"])
        for x in q_pandas_udaf_agg(spark, SF0001).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}


def test_pandas_udaf_window_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.sources_q import (
        q_pandas_udaf_window,
    )

    o = _tbl("orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    by_cust: dict[int, list] = {}
    for ok, ck, tp in zip(o["o_orderkey"], o["o_custkey"], o["o_totalprice"]):
        by_cust.setdefault(ck, []).append((ok, tp))
    expected = {}
    for ck, rows in by_cust.items():
        rows.sort()
        run = 0
        for ok, tp in rows:
            run += _cents(tp)
            expected[ok] = run
    got = {
        x["o_orderkey"]: x["running_cents"]
        for x in q_pandas_udaf_window(spark, SF0001).collect()
    }
    assert got == expected


def test_mom_growth_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics16 import (
        q_mom_growth,
    )

    o = _tbl("orders", ["o_orderdate", "o_totalprice"])
    months: dict = {}
    for d, tp in zip(o["o_orderdate"], o["o_totalprice"]):
        m = d.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
        months[m] = months.get(m, 0) + _cents(tp)
    seq = sorted(months)
    expected = {}
    for i, m in enumerate(seq):
        rev = float(months[m]) / 100.0
        if i == 0:
            expected[m] = (rev, None)
        else:
            prev = float(months[seq[i - 1]]) / 100.0
            expected[m] = (rev, (rev - prev) / prev)
    got = {
        x["month"]: (x["revenue"], x["mom_growth"])
        for x in q_mom_growth(spark, SF0001).collect()
    }
    assert got == expected


def test_sliding_window_agg_matches_pure_python(spark):
    import datetime

    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics2 import (
        q_sliding_window_agg,
    )

    ev = _tbl("events", ["ts", "value"])
    agg: dict = {}
    for ts, v in zip(ev["ts"], ev["value"]):
        h = ts.replace(minute=0, second=0, microsecond=0)
        for ws in (h, h - datetime.timedelta(hours=1)):
            s = agg.setdefault(ws, [0, 0])
            s[0] += 1
            s[1] += _cents(v)
    got = {
        x["window_start"]: (x["n_events"], x["sum_value"])
        for x in q_sliding_window_agg(spark, SF0001).collect()
    }
    assert got == {k: (n, float(c) / 100.0) for k, (n, c) in agg.items()}


def test_salted_aggregate_matches_pure_python(spark):
    """Salting is a plan transformation, not a semantics one: the
    two-phase result must equal the direct pure-Python group-by."""
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics17 import (
        q_salted_aggregate,
    )

    li = _tbl("lineitem", ["l_returnflag", "l_extendedprice"])
    agg: dict = {}
    for rf, ep in zip(li["l_returnflag"], li["l_extendedprice"]):
        s = agg.setdefault(rf, [0, 0])
        s[0] += _cents(ep)
        s[1] += 1
    got = {
        x["l_returnflag"]: (x["sum_price"], x["n_lines"])
        for x in q_salted_aggregate(spark, SF0001).collect()
    }
    assert got == {k: (float(c) / 100.0, n) for k, (c, n) in agg.items()}


def test_cusum_control_matches_pure_python(spark):
    """The two-window unroll of S_t = max(0, S_{t-1} + (x_t - mu))
    must equal the direct recursion computed in exact integers."""
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics49 import (
        q_cusum_control,
    )

    o = _tbl("orders", ["o_orderdate", "o_totalprice"])
    daily: dict = {}
    for d, tp in zip(o["o_orderdate"], o["o_totalprice"]):
        daily[d] = daily.get(d, 0) + _cents(tp)
    days = sorted(daily)
    n, total = len(days), sum(daily.values())
    expected = {}
    cum = 0
    s_direct = 0  # the recursion itself, scaled by n
    run_min = 0
    for d in days:
        dev = daily[d] * n - total
        cum += dev
        run_min = min(run_min, cum)
        s_direct = max(0, s_direct + dev)
        scaled = cum - min(run_min, 0)
        assert scaled == s_direct  # identity the plan relies on
        expected[d] = (daily[d], scaled, float(scaled) / float(n))
    got = {
        x["day"]: (x["cents"], x["cusum_scaled"], x["cusum_cents"])
        for x in q_cusum_control(spark, SF0001).collect()
    }
    assert got == expected


def test_window_time_range_matches_pure_python(spark):
    """RANGE (value-based) trailing-1h frame: includes every same-user
    event within 3.6e9 micros INCLUDING peers at the exact same
    timestamp, regardless of row position."""
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics6 import (
        q_window_time_range,
    )

    ev = _tbl("events", ["user_id", "event_id", "ts", "value"])
    by_user: dict[int, list] = {}
    for u, eid, ts, v in zip(ev["user_id"], ev["event_id"], ev["ts"], ev["value"]):
        us = int(ts.timestamp() * 1_000_000)
        by_user.setdefault(u, []).append((us, eid, _cents(v)))
    expected = {}
    for u, rows in by_user.items():
        for us, eid, _c in rows:
            s = sum(c2 for us2, _e2, c2 in rows if us - 3_600_000_000 <= us2 <= us)
            expected[eid] = float(s) / 100.0
    got = {
        x["event_id"]: x["trailing_1h_value"]
        for x in q_window_time_range(spark, SF0001).collect()
    }
    assert got == expected


def test_supplier_hhi_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics34 import (
        q_supplier_hhi,
    )

    li = _tbl("lineitem", ["l_suppkey", "l_extendedprice"])
    s = _tbl("supplier", ["s_suppkey", "s_nationkey"])
    smap = dict(zip(s["s_suppkey"], s["s_nationkey"]))
    sup_cents: dict[tuple, int] = {}
    for sk, ep in zip(li["l_suppkey"], li["l_extendedprice"]):
        key = (smap[sk], sk)
        sup_cents[key] = sup_cents.get(key, 0) + _cents(ep)
    nat_cents: dict[int, int] = {}
    for (nk, _sk), c in sup_cents.items():
        nat_cents[nk] = nat_cents.get(nk, 0) + c
    import math as _m

    hhi: dict[int, int] = {}
    top: dict[int, float] = {}
    nsup: dict[int, int] = {}
    for (nk, _sk), c in sup_cents.items():
        share = (float(c) / 100.0) / (float(nat_cents[nk]) / 100.0)
        hhi[nk] = hhi.get(nk, 0) + int(_m.floor(share * share * 1e12))
        top[nk] = max(top.get(nk, 0.0), share)
        nsup[nk] = nsup.get(nk, 0) + 1
    got = {
        x["s_nationkey"]: (x["n_suppliers"], x["hhi"], x["top_share"])
        for x in q_supplier_hhi(spark, SF0001).collect()
    }
    assert got == {
        nk: (nsup[nk], float(hhi[nk]) / 1e12, top[nk]) for nk in hhi
    }


def _q6dp(x: float):
    """Spark/DuckDB double→DECIMAL(25,6): HALF_UP at 1e-6 on the exact
    decimal expansion of the IEEE double."""
    import decimal

    return decimal.Decimal(x).quantize(
        decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
    )


def test_backtest_seasonal_naive_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics39 import (
        q_backtest_seasonal_naive,
    )

    o = _tbl("orders", ["o_orderdate", "o_totalprice"])
    daily: dict = {}
    for d, tp in zip(o["o_orderdate"], o["o_totalprice"]):
        daily[d.date()] = daily.get(d.date(), 0) + _cents(tp)
    days = sorted(daily)
    rev = [float(daily[d]) / 100.0 for d in days]
    import decimal

    err_n = decimal.Decimal(0)
    err_s = decimal.Decimal(0)
    n_days = 0
    for i in range(len(days)):
        if i < 7:
            continue  # both lags defined only from index 7 on
        err_n += _q6dp(abs(rev[i] - rev[i - 1]))
        err_s += _q6dp(abs(rev[i] - rev[i - 7]))
        n_days += 1
    got = {
        x["model"]: (x["n_days"], x["total_abs_err"])
        for x in q_backtest_seasonal_naive(spark, SF0001).collect()
    }
    assert got == {
        "naive_1d": (n_days, float(err_n)),
        "seasonal_7d": (n_days, float(err_s)),
    }


def test_seasonal_decompose_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics43 import (
        q_seasonal_decompose,
    )

    o = _tbl("orders", ["o_orderdate", "o_totalprice"])
    daily: dict = {}
    for d, tp in zip(o["o_orderdate"], o["o_totalprice"]):
        daily[d.date()] = daily.get(d.date(), 0) + _cents(tp)
    days = sorted(daily)
    rev = [float(daily[d]) / 100.0 for d in days]
    det_rows = []  # (date, dow, revenue, trend, detrended)
    for i in range(3, len(days) - 3):
        tsum = sum((_q6dp(rev[j]) for j in range(i - 3, i + 4)))
        trend = float(tsum) / 7
        dow = ((days[i].weekday() + 1) % 7) + 1  # Spark: 1=Sunday
        det_rows.append((days[i], dow, rev[i], trend, rev[i] - trend))
    seas_sum: dict = {}
    seas_n: dict = {}
    for _d, dow, _r, _t, det in det_rows:
        seas_sum[dow] = seas_sum.get(dow, 0) + _q6dp(det)
        seas_n[dow] = seas_n.get(dow, 0) + 1
    seasonal = {dow: float(s) / seas_n[dow] for dow, s in seas_sum.items()}
    expected = {
        d: (r, t, seasonal[dow], det - seasonal[dow])
        for d, dow, r, t, det in det_rows
    }
    got = {
        x["d"]: (x["revenue"], x["trend"], x["seasonal"], x["residual"])
        for x in q_seasonal_decompose(spark, SF0001).collect()
    }
    assert got == expected


def test_csv_corrupt_recovery_matches_pure_python(spark):
    """The converted part is the good-row cents sum, which must equal
    the CLEAN orders table's sum — corrupt lines must never leak into
    the lattice aggregate."""
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics42 import (
        _N_BAD,
        q_csv_corrupt_recovery,
    )

    o = _tbl("orders", ["o_totalprice"])
    n = len(o["o_totalprice"])
    total = sum(_cents(p) for p in o["o_totalprice"])
    row = q_csv_corrupt_recovery(spark, SF0001).collect()[0]
    assert (
        row["n_lines"], row["n_good"], row["n_corrupt"],
        row["n_dropmalformed"], row["sum_good_price"],
    ) == (n + _N_BAD, n, _N_BAD, n, float(total) / 100.0)


def test_json_corrupt_recovery_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics42 import (
        _N_BAD_J,
        q_json_corrupt_recovery,
    )

    o = _tbl("orders", ["o_totalprice"])
    n = len(o["o_totalprice"])
    total = sum(_cents(p) for p in o["o_totalprice"])
    row = q_json_corrupt_recovery(spark, SF0001).collect()[0]
    assert (
        row["n_lines"], row["n_good"], row["n_corrupt"], row["sum_good_price"]
    ) == (n + _N_BAD_J, n, _N_BAD_J, float(total) / 100.0)


def test_file_provenance_matches_pure_python(spark):
    """Path-derived provenance report must equal the data-derived
    monthly report computed from raw parquet bytes."""
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics52 import (
        q_file_provenance,
    )

    o = _tbl("orders", ["o_orderdate", "o_custkey", "o_totalprice"])
    agg: dict = {}
    for d, ck, tp in zip(o["o_orderdate"], o["o_custkey"], o["o_totalprice"]):
        m = d.date().replace(day=1)
        s = agg.setdefault(m, [0, 0, set()])
        s[0] += 1
        s[1] += _cents(tp)
        s[2].add(ck)
    got = {
        x["order_month"]: (x["n_rows"], x["total_cents"], x["n_customers"])
        for x in q_file_provenance(spark, SF0001).collect()
    }
    assert got == {m: (n, c, len(ks)) for m, (n, c, ks) in agg.items()}


def test_sql_pipe_syntax_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.spark4 import (
        q_sql_pipe_syntax,
    )

    li = _tbl("lineitem", ["l_returnflag", "l_shipdate", "l_extendedprice", "l_discount"])
    cut = _ts("1996-01-01")
    agg: dict = {}
    for rf, sd, ep, d in zip(
        li["l_returnflag"], li["l_shipdate"], li["l_extendedprice"], li["l_discount"]
    ):
        if sd < cut:
            continue
        s = agg.setdefault(rf, [0, 0])
        s[0] += 1
        s[1] += _rev_units(ep, d)
    got = {
        x["l_returnflag"]: (x["n_lines"], x["revenue"])
        for x in q_sql_pipe_syntax(spark, SF0001).collect()
    }
    assert got == {k: (n, float(u) / 10000.0) for k, (n, u) in agg.items()}


def test_sql_udf_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics20 import (
        q_sql_udf,
    )

    li = _tbl("lineitem", ["l_returnflag", "l_extendedprice", "l_discount"])
    agg: dict = {}
    for rf, ep, d in zip(li["l_returnflag"], li["l_extendedprice"], li["l_discount"]):
        s = agg.setdefault(rf, [0, 0])
        s[0] += _rev_units(ep, d)
        s[1] += 1
    got = {
        x["l_returnflag"]: (x["net_revenue"], x["n_lines"])
        for x in q_sql_udf(spark, SF0001).collect()
    }
    assert got == {k: (float(u) / 10000.0, n) for k, (u, n) in agg.items()}


def test_subquery_scalar_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics3 import (
        q_subquery_scalar,
    )

    o = _tbl("orders", ["o_orderkey", "o_totalprice"])
    mean = float(sum(_cents(p) for p in o["o_totalprice"])) / 100.0 / len(
        o["o_totalprice"]
    )
    expected = {
        ok: tp - mean for ok, tp in zip(o["o_orderkey"], o["o_totalprice"])
    }
    got = {
        x["o_orderkey"]: x["diff_from_mean"]
        for x in q_subquery_scalar(spark, SF0001).collect()
    }
    assert got == expected


def test_sql_session_variables_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.spark4b import (
        _MIN_CENTS,
        q_sql_session_variables,
    )

    o = _tbl("orders", ["o_orderpriority", "o_totalprice"])
    agg: dict = {}
    for pr, tp in zip(o["o_orderpriority"], o["o_totalprice"]):
        c = _cents(tp)
        if c >= _MIN_CENTS:
            s = agg.setdefault(pr, [0, 0])
            s[0] += 1
            s[1] += c
    got = {
        x["o_orderpriority"]: (x["n_orders"], x["total_cents"])
        for x in q_sql_session_variables(spark, SF0001).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}


def test_chi2_independence_matches_pure_python(spark):
    """FLOOR 1e-12 lattice terms over exact integer marginals (the
    r11 final conversion) re-derived directly."""
    import math as _m

    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics20 import (
        q_chi2_independence,
    )

    o = _tbl("orders", ["o_orderstatus", "o_orderpriority"])
    cells: dict = {}
    for s, p in zip(o["o_orderstatus"], o["o_orderpriority"]):
        cells[(s, p)] = cells.get((s, p), 0) + 1
    r: dict = {}
    c: dict = {}
    n = 0
    for (s, p), cnt in cells.items():
        r[s] = r.get(s, 0) + cnt
        c[p] = c.get(p, 0) + cnt
        n += cnt
    total_terms = 0
    for (s, p), cnt in cells.items():
        diff = float(cnt * n - r[s] * c[p])
        total_terms += int(_m.floor(diff * diff / float(n * r[s] * c[p]) * 1e12))
    row = q_chi2_independence(spark, SF0001).collect()[0]
    assert row["chi2_stat"] == float(total_terms) / 1e12
    assert row["dof"] == (len(r) - 1) * (len(c) - 1)
    assert row["n"] == n


def test_abc_classification_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics15 import (
        q_abc_classification,
    )

    li = _tbl("lineitem", ["l_partkey", "l_extendedprice", "l_discount"])
    rev: dict[int, int] = {}
    for pk, ep, d in zip(li["l_partkey"], li["l_extendedprice"], li["l_discount"]):
        rev[pk] = rev.get(pk, 0) + _rev_units(ep, d)
    order = sorted(rev, key=lambda pk: (-rev[pk], pk))
    total = sum(rev.values())
    expected = {}
    cum = 0
    for pk in order:
        cum += rev[pk]
        cls = "A" if cum * 5 <= total * 4 else ("B" if cum * 20 <= total * 19 else "C")
        expected[pk] = (float(rev[pk]) / 10000.0, cls)
    got = {
        x["l_partkey"]: (x["revenue"], x["abc_class"])
        for x in q_abc_classification(spark, SF0001).collect()
    }
    assert got == expected


def _ntile(keys, k=5):
    """SQL NTILE over an already-ordered key list: first n%k tiles get
    one extra row."""
    n = len(keys)
    base, extra = divmod(n, k)
    out = {}
    i = 0
    for t in range(1, k + 1):
        size = base + (1 if t <= extra else 0)
        for key in keys[i : i + size]:
            out[key] = t
        i += size
    return out


def test_rfm_segments_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics15 import (
        q_rfm_segments,
    )

    o = _tbl("orders", ["o_custkey", "o_orderdate", "o_totalprice"])
    base: dict = {}
    for ck, d, tp in zip(o["o_custkey"], o["o_orderdate"], o["o_totalprice"]):
        s = base.setdefault(ck, [None, 0, 0])
        s[0] = d if s[0] is None or d > s[0] else s[0]
        s[1] += 1
        s[2] += _cents(tp)
    custs = list(base)
    r_score = _ntile(sorted(custs, key=lambda ck: (_neg_ts(base[ck][0]), ck)))
    f_score = _ntile(sorted(custs, key=lambda ck: (-base[ck][1], ck)))
    m_score = _ntile(sorted(custs, key=lambda ck: (-base[ck][2], ck)))
    expected = {
        ck: (
            base[ck][0],
            base[ck][1],
            float(base[ck][2]) / 100.0,
            r_score[ck],
            f_score[ck],
            m_score[ck],
        )
        for ck in custs
    }
    got = {
        x["o_custkey"]: (
            x["last_order"], x["frequency"], x["monetary"],
            x["r_score"], x["f_score"], x["m_score"],
        )
        for x in q_rfm_segments(spark, SF0001).collect()
    }
    assert got == expected


def _neg_ts(d):
    return -d.timestamp()


def test_change_point_flags_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics30 import (
        _CP_W,
        q_change_point_flags,
    )

    o = _tbl("orders", ["o_orderdate", "o_totalprice"])
    daily: dict = {}
    for d, tp in zip(o["o_orderdate"], o["o_totalprice"]):
        daily[d.date()] = daily.get(d.date(), 0) + _cents(tp)
    days = sorted(daily)
    rev = [float(daily[d]) / 100.0 for d in days]
    expected = {}
    for i in range(_CP_W, len(days) - _CP_W + 1):
        before = sum(rev[i - _CP_W : i]) / _CP_W
        after = sum(rev[i : i + _CP_W]) / _CP_W
        if abs(after - before) > 0.5 * before:
            expected[days[i]] = (rev[i], before, after)
    got = {
        x["day"]: (x["revenue"], x["before_mean"], x["after_mean"])
        for x in q_change_point_flags(spark, SF0001).collect()
    }
    # float mean: Spark AVG over a ROWS frame sums in frame order,
    # Python sum() over the same slice is the same left-to-right order
    assert got == expected


def test_recursive_month_series_matches_pure_python(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics11 import (
        q_recursive_month_series,
    )

    o = _tbl("orders", ["o_orderdate", "o_totalprice"])
    monthly: dict = {}
    for d, tp in zip(o["o_orderdate"], o["o_totalprice"]):
        m = d.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
        s = monthly.setdefault(m, [0, 0])
        s[0] += 1
        s[1] += _cents(tp)
    lo, hi = min(monthly), max(monthly)
    expected = {}
    m = lo
    while m <= hi:
        n, c = monthly.get(m, (0, 0))
        expected[m] = (n, float(c) / 100.0)
        nxt_month = (m.month % 12) + 1
        nxt_year = m.year + (1 if m.month == 12 else 0)
        m = m.replace(year=nxt_year, month=nxt_month)
    got = {
        x["month_start"]: (x["n_orders"], x["revenue"])
        for x in q_recursive_month_series(spark, SF0001).collect()
    }
    assert got == expected
