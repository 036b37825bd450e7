from __future__ import annotations

import hashlib
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics44 import (
    q_bigram_novelty,
    q_ewma_taps,
    q_gini_impurity,
    q_kfold_assign,
    q_rank_auc,
)

SF0001 = "/root/testdata/sf0.001"


def _auc_reference(pairs):
    """Brute-force Mann-Whitney AUC: P(score_pos > score_neg) with
    ties counted half — the definition the rank formula must equal."""
    pos = [s for s, p in pairs if p]
    neg = [s for s, p in pairs if not p]
    wins = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def test_rank_auc_matches_bruteforce(spark):
    rows = {r["o_orderpriority"]: r for r in q_rank_auc(spark, SF0001).collect()}
    orders = (
        load(spark, SF0001, "orders")
        .select("o_orderpriority", "o_totalprice", "o_orderstatus")
        .collect()
    )
    by_prio: dict[str, list] = {}
    for o in orders:
        by_prio.setdefault(o["o_orderpriority"], []).append(
            (o["o_totalprice"], o["o_orderstatus"] == "F")
        )
    for prio, pairs in by_prio.items():
        n_pos = sum(1 for _, p in pairs if p)
        n_neg = len(pairs) - n_pos
        if n_pos == 0 or n_neg == 0:
            assert prio not in rows
            continue
        assert abs(rows[prio]["auc"] - _auc_reference(pairs)) < 1e-12
        assert rows[prio]["n_pos"] == n_pos
        assert rows[prio]["n_neg"] == n_neg


def test_gini_impurity_bounds_and_reference(spark):
    rows = q_gini_impurity(spark, SF0001).collect()
    cust = (
        load(spark, SF0001, "customer")
        .join(
            load(spark, SF0001, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("n_name", "c_mktsegment")
        .collect()
    )
    mix: dict[str, Counter] = {}
    for c in cust:
        mix.setdefault(c["n_name"], Counter())[c["c_mktsegment"]] += 1
    assert {r["n_name"] for r in rows} == set(mix)
    for r in rows:
        counts = mix[r["n_name"]]
        n = sum(counts.values())
        expected = 1.0 - sum((c / n) ** 2 for c in counts.values())
        assert abs(r["gini_impurity"] - expected) < 1e-12
        # impurity of a k-way mix is bounded by 1 - 1/k
        assert 0.0 <= r["gini_impurity"] <= 1.0 - 1.0 / max(len(counts), 1) + 1e-12
        assert r["n_customers"] == n


def test_kfold_assignment_is_md5_exact_and_total(spark):
    rows = q_kfold_assign(spark, SF0001).collect()
    orders = load(spark, SF0001, "orders").select(
        "o_orderkey", "o_totalprice"
    ).collect()
    expected = Counter(
        int(hashlib.md5(f"fold:{o['o_orderkey']}".encode()).hexdigest()[:6], 16) % 5
        for o in orders
    )
    got = {r["fold"]: r["n_orders"] for r in rows}
    assert got == dict(expected)
    assert sum(got.values()) == len(orders)
    # r11 re-lattice pin (DESIGN §21 / the ewma precedent): the price
    # audit column is EXACT int64 cents — equality vs a pure-Python
    # re-derivation, independent of any engine's decimal typing rules.
    cents = Counter()
    for o in orders:
        fold = (
            int(hashlib.md5(f"fold:{o['o_orderkey']}".encode()).hexdigest()[:6], 16)
            % 5
        )
        cents[fold] += round(o["o_totalprice"] * 100)
    got_cents = {r["fold"]: int(r["sum_price_cents"]) for r in rows}
    assert got_cents == dict(cents)


def test_ewma_taps_matches_pure_python_fir(spark):
    """The r10 BIGINT-cents lattice (DESIGN §21) is EXACT integer
    arithmetic end-to-end, so the pin is equality, not tolerance —
    and the daily cents must equal Python's own round(price*100)
    sums, independent of any engine's decimal typing rules."""
    rows = sorted(q_ewma_taps(spark, SF0001).collect(), key=lambda r: r["day"])
    series = [int(r["rev_cents"]) for r in rows]
    weights = [128, 64, 32, 16, 8, 4, 2, 1]
    for t, r in enumerate(rows):
        expected = sum(
            w * (series[t - k] if t - k >= 0 else 0)
            for k, w in enumerate(weights)
        )
        assert int(r["ewma_cents_x256"]) == expected

    # daily cents match a pandas-side integer re-derivation exactly
    import pandas as pd

    orders = pd.read_parquet(os.path.join(SF0001, "orders.parquet"))
    cents = (
        (orders["o_totalprice"] * 100)
        .round()
        .astype("int64")
        .groupby(orders["o_orderdate"])
        .sum()
    )
    got = {r["day"]: int(r["rev_cents"]) for r in rows}
    assert len(got) == len(cents)
    for day, v in cents.items():
        assert got[day] == int(v), day


def test_bigram_novelty_counts_and_rate(spark):
    rows = q_bigram_novelty(spark, SF0001).collect()
    docs = load(spark, SF0001, "documents").select("doc_id", "text").collect()
    per_doc: dict = {}
    df_docs: dict[str, set] = {}
    for d in docs:
        toks = d["text"].strip().split(" ")
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if not bgs:
            continue
        per_doc[d["doc_id"]] = bgs
        for bg in set(bgs):
            df_docs.setdefault(bg, set()).add(d["doc_id"])
    assert {r["doc_id"] for r in rows} == set(per_doc)
    for r in rows:
        bgs = per_doc[r["doc_id"]]
        shared = sum(1 for bg in bgs if len(df_docs[bg]) >= 2)
        assert r["n_bigrams"] == len(bgs)
        assert r["n_shared"] == shared
        assert abs(r["shared_rate"] - shared / len(bgs)) < 1e-12
