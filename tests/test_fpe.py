"""Feistel pseudonymization (functions/fpe.py): bijection,
invertibility, avalanche, and parity with an independent pure-Python
reimplementation of the network."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.functions.fpe import (
    _BITS,
    _MASK,
    ROUNDS,
    depseudonymize48,
    pseudonymize48,
)


def _py_f(half: int, rnd: int, tweak: str) -> int:
    d = hashlib.md5(f"fpe:{tweak}:{rnd}:{half}".encode()).hexdigest()
    return int(d[:6], 16)


def _py_pseudo(key: int, tweak: str = "k1") -> int:
    left, right = key >> _BITS, key & _MASK
    for rnd in range(1, ROUNDS + 1):
        left, right = right, left ^ _py_f(right, rnd, tweak)
    return (left << _BITS) + right


def test_matches_independent_reference_and_inverts(spark):
    keys = [0, 1, 7, 12345, _MASK, _MASK + 1, (1 << 48) - 1]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    out = df.select(
        "k",
        pseudonymize48(F.col("k")).alias("p"),
        depseudonymize48(pseudonymize48(F.col("k"))).alias("back"),
    ).collect()
    for r in out:
        assert r["p"] == _py_pseudo(r["k"])
        assert r["back"] == r["k"]
        assert 0 <= r["p"] < (1 << 48)


def test_bijection_and_avalanche(spark):
    n = 5000
    df = spark.range(n).select(F.col("id").alias("k"))
    p = df.select("k", pseudonymize48(F.col("k")).alias("p"))
    assert p.select("p").distinct().count() == n  # no collisions
    # consecutive keys land far apart (avalanche): no fixed offset
    pairs = p.orderBy("k").select("p").limit(100).collect()
    diffs = {pairs[i + 1][0] - pairs[i][0] for i in range(99)}
    assert len(diffs) > 90


def test_tweak_changes_mapping(spark):
    df = spark.range(100).select(F.col("id").alias("k"))
    a = df.select(pseudonymize48(F.col("k"), "k1").alias("p")).collect()
    b = df.select(pseudonymize48(F.col("k"), "k2").alias("p")).collect()
    assert [r["p"] for r in a] != [r["p"] for r in b]
