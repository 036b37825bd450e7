"""Skew mitigation: key salting for aggregations and joins.

AQE's skew-join splitting (enabled in the session factory) handles
most skew at runtime by splitting oversized shuffle partitions. Salting
is the explicit fallback for the cases AQE can't fix: a single hot KEY
(not just a hot partition) in an aggregation, or a hot build-side key
in a join.

- **Salted aggregation**: two-phase — aggregate on (key, salt) first
  (splits the hot key across ``salt_buckets`` reducers), then
  re-aggregate on key. Works for any commutative/associative aggregate
  (sum/count/min/max — the partial-aggregation algebra).
- **Salted join**: salt the skewed fact side, explode the dim side
  ``salt_buckets``-fold, equi-join on (key, salt). Trades dim
  duplication for even fact distribution.

100 TB: salt only when a key's row count exceeds what one task can
hold (~partition target / row width). Monitor via the count skew of
``groupBy(key).count()`` percentiles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}. The re-aggregation fn for count is sum;
    min/max/sum re-aggregate with themselves.
    """
    phase1_aggs, phase2_aggs = [], []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            phase1_aggs.append(F.count(col).alias(out))
            phase2_aggs.append(F.sum(out).alias(out))
        elif fn == "sum":
            phase1_aggs.append(F.sum(col).alias(out))
            phase2_aggs.append(F.sum(out).alias(out))
        elif fn in ("min", "max"):
            agg = getattr(F, fn)
            phase1_aggs.append(agg(col).alias(out))
            phase2_aggs.append(agg(out).alias(out))
        else:
            raise ValueError(f"non-reaggregable fn: {fn}")
    salted = df.withColumn(_SALT, (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, _SALT).agg(*phase1_aggs)
    return partial.groupBy(*keys).agg(*phase2_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the fact side, replicate the dim side
    per salt bucket, join on (key, salt)."""
    salted_fact = fact.withColumn(
        _SALT, (F.rand(seed=42) * salt_buckets).cast("int")
    )
    replicated_dim = dim.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_fact.join(replicated_dim, on=[on, _SALT], how=how).drop(_SALT)
