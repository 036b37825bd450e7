"""Discrete geometric mechanism: the trailing-zero draw really is
Geometric(1/2), the noise distribution is symmetric two-sided
geometric, and the release is a correct post-processing of the true
counts."""

from __future__ import annotations

import hashlib
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics58 import (
    q_dp_noisy_counts,
)

SF0001 = "/root/testdata/sf0.001"


def _tz48(h: int) -> int:
    if h == 0:
        return 48
    return min((h & -h).bit_length() - 1, 48)


def _draw(key: str, salt: str) -> int:
    h = int(hashlib.md5((salt + key).encode()).hexdigest()[:12], 16)
    return _tz48(h)


def test_trailing_zero_draw_is_geometric_half():
    """Over many keys, P(tz = k) ~ 2^-(k+1): the empirical frequencies
    of the first few values must be within a loose tolerance."""
    n = 20000
    counts = Counter(_draw(str(i), "t:") for i in range(n))
    for k in range(4):
        expected = n * 2 ** -(k + 1)
        assert abs(counts[k] - expected) < 0.15 * expected, (k, counts[k])


def test_noise_symmetric_and_centered():
    n = 20000
    noises = [
        _draw(str(i), "a:") - _draw(str(i), "b:") for i in range(n)
    ]
    mean = sum(noises) / n
    assert abs(mean) < 0.05  # E[noise] = 0; var = 4 => se ~ 0.014
    pos = sum(1 for v in noises if v > 0)
    neg = sum(1 for v in noises if v < 0)
    assert abs(pos - neg) < 0.05 * n


def test_release_is_post_processing(spark):
    """noisy_count = max(true + noise, 0) for every group — recompute
    true counts independently and verify the clamp arithmetic."""
    from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load

    rel = {
        (r.nation, r.priority): (r.noise, r.noisy_count)
        for r in q_dp_noisy_counts(spark, SF0001).collect()
    }
    orders = load(spark, SF0001, "orders").toPandas()
    cust = load(spark, SF0001, "customer").toPandas()
    nat = load(spark, SF0001, "nation").toPandas()
    merged = orders.merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    ).merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    true = merged.groupby(["n_name", "o_orderpriority"]).size()
    assert len(rel) == len(true)
    for (nation, prio), t in true.items():
        key = f"{nation}|{prio}"
        expect = _draw(key, "dp-g1:") - _draw(key, "dp-g2:")
        noise, noisy = rel[(nation, prio)]
        assert noise == expect, (nation, prio)
        assert noisy == max(int(t) + noise, 0)
