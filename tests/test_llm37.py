"""Pairwise-preference tier (llm37): exact-match parity of the
histogram-decomposed Mann-Whitney U against a brute-force pure-Python
pair count, and sanity/structure checks on Rank Centrality."""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_ecommerce_etl_pipeline_spark.plans.llm37 import (
    _P_SCALE,
    _V_SCALE,
    q_mann_whitney_u,
    q_rank_centrality,
)

SF0001 = "/root/testdata/sf0.001"


def _doc_lengths(spark):
    rows = spark.read.parquet(f"{SF0001}/documents.parquet").select(
        "source", "n_chars"
    ).collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r.source].append(r.n_chars)
    return by_src


def test_mann_whitney_matches_bruteforce_pairs(spark):
    by_src = _doc_lengths(spark)
    got = {
        (r.source_a, r.source_b): r
        for r in q_mann_whitney_u(spark, SF0001).collect()
    }
    srcs = sorted(by_src)
    assert set(got) == {(a, b) for a in srcs for b in srcs if a < b}
    # brute-force doubled U on a handful of pairs
    for a, b in [(srcs[0], srcs[1]), (srcs[2], srcs[-1]), (srcs[5], srcs[9])]:
        u2 = sum(
            2 if va > vb else (1 if va == vb else 0)
            for va in by_src[a]
            for vb in by_src[b]
        )
        r = got[(a, b)]
        assert r.u2_a == u2
        assert r.u2_b == 2 * len(by_src[a]) * len(by_src[b]) - u2
        assert r.win_per_10k_a == u2 * 10000 // (
            2 * len(by_src[a]) * len(by_src[b])
        )


def test_rank_centrality_matches_pure_python_chain(spark):
    """Replay the integer fixed-point chain in pure Python and demand
    bit-equality (the same invariant the DuckDB oracle checks, proven
    against a third implementation)."""
    by_src = _doc_lengths(spark)
    srcs = sorted(by_src)
    k = len(srcs)
    wins = {}
    for i in srcs:
        for j in srcs:
            if i == j:
                continue
            wins[(i, j)] = sum(
                2 if vi > vj else (1 if vi == vj else 0)
                for vi in by_src[i]
                for vj in by_src[j]
            )
    p = {}
    for i in srcs:
        off = 0
        for j in srcs:
            if i == j:
                continue
            pij = (
                wins[(j, i)] * _P_SCALE
                // (2 * len(by_src[i]) * len(by_src[j]) * (k - 1))
            )
            p[(i, j)] = pij
            off += pij
        p[(i, i)] = _P_SCALE - off
    v = {s: _V_SCALE // k for s in srcs}
    for _ in range(3):
        v = {
            j: sum(v[i] * p[(i, j)] for i in srcs) // _P_SCALE
            for j in srcs
        }
    got = {r.source: (r.score_scaled, r.rk) for r in
           q_rank_centrality(spark, SF0001).collect()}
    assert {s: sc for s, (sc, _) in got.items()} == v
    order = sorted(srcs, key=lambda s: (-v[s], s))
    assert [s for s, _ in sorted(got.items(), key=lambda kv: kv[1][1])] == order
    # the chain conserves (almost all of) the lattice mass
    assert abs(sum(v.values()) - _V_SCALE) < k * k


def test_gate_agreement_kappa_matches_sklearn_formula(spark):
    """Replay Cohen's kappa in pure Python from the raw corpus and the
    same frozen weights; demand exact integer parity and the one-
    division float."""
    from lakehouse_ecommerce_etl_pipeline_spark.plans.llm26 import _W
    from lakehouse_ecommerce_etl_pipeline_spark.plans.llm37 import (
        _TOK_GATE,
        q_gate_agreement_kappa,
    )
    import re

    rows = spark.read.parquet(f"{SF0001}/documents.parquet").select(
        "text"
    ).collect()
    n11 = n10 = n01 = n00 = 0
    for r in rows:
        t = r.text or ""
        toks = len(re.findall(r"\S+", t))
        punct = (
            sum(1 for ch in t if not ch.isalnum() and not ch.isspace())
            / len(t)
            if t else 0.0
        )
        z = _W[0] + (len(t) / 1000.0) * _W[1] + punct * _W[2] + (
            toks / 100.0
        ) * _W[3]
        a, b = int(z > 0), int(toks >= _TOK_GATE)
        if a and b:
            n11 += 1
        elif a:
            n10 += 1
        elif b:
            n01 += 1
        else:
            n00 += 1
    n = n11 + n10 + n01 + n00
    pe = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    got = q_gate_agreement_kappa(spark, SF0001).collect()[0]
    assert (got.n, got.n11, got.n10, got.n01, got.n00) == (
        n, n11, n10, n01, n00,
    )
    assert got.kappa_num == n * (n11 + n00) - pe
    assert got.kappa_den == n * n - pe
    assert got.kappa == got.kappa_num / got.kappa_den
    assert 0.5 < got.kappa <= 1.0  # the two gates genuinely agree


def test_doubled_wins_decomposition_random_multisets(spark, tmp_path):
    """Property check of the spine-cumulative decomposition on random
    (source, value) multisets with heavy ties — equals the O(n^2)
    brute force exactly (seeded, multiple shapes)."""
    import itertools
    import random

    from lakehouse_ecommerce_etl_pipeline_spark.plans.llm37 import (
        _doubled_wins,
        _hist,
    )

    rng = random.Random(7)
    for trial in range(4):
        n_src = rng.randint(2, 5)
        data = [
            (f"s{si}", rng.randint(0, 6))  # tiny domain → many ties
            for si in range(n_src)
            for _ in range(rng.randint(1, 30))
        ]
        df = spark.createDataFrame(data, "source string, n_chars long")
        h, _ = _hist(df)
        got = {(r.si, r.sj): r.w for r in _doubled_wins(h).collect()}
        vals = {}
        for s, v in data:
            vals.setdefault(s, []).append(v)
        for a, b in itertools.permutations(sorted(vals), 2):
            w = sum(
                2 if va > vb else (1 if va == vb else 0)
                for va in vals[a]
                for vb in vals[b]
            )
            assert got[(a, b)] == w, (trial, a, b)
