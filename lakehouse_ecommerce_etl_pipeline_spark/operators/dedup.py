"""Key-based deduplication.

reference: glue_jobs/orders_etl.py:74 (``dropDuplicates(["order_id"])``),
glue_jobs/order_items_etl.py:104 (by ``id``),
glue_jobs/product_etl.py:60 (by ``product_id``).

Two variants:

- ``dedup_arbitrary`` — the reference's exact semantics: keep one
  arbitrary row per key. Fastest plan (hash-aggregate keyed on the
  dedup columns; AQE handles skewed keys).
- ``dedup_deterministic`` — keep the FIRST row per key under an
  explicit total order. This is the oracle-comparable variant and the
  load-bearing pre-MERGE invariant (Delta MERGE fails on duplicate
  source keys — SURVEY.md §7 hard-part 2).

100 TB: both are a single shuffle on the key. ``dedup_deterministic``
uses ``row_number`` over (key, order); for heavily skewed keys prefer
``dedup_arbitrary`` + AQE, or pre-aggregate with ``min_by``-style
``F.min_by`` when only one ordering column matters (map-side partial
aggregation, cheaper than a full window sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__dedup_rn"


def dedup_arbitrary(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Reference semantics: one arbitrary row per key (orders_etl.py:74)."""
    return df.dropDuplicates(list(keys))


def dedup_deterministic(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column | str]
) -> DataFrame:
    """First row per key under ``order_by`` (must be a total order
    within each key group for determinism)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(_RN, F.row_number().over(w)).filter(F.col(_RN) == 1).drop(_RN)
    )


def dedup_minby(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column | str]
) -> DataFrame:
    """First row per key under ``order_by`` as an AGGREGATION:
    ``min_by(struct(all columns), struct(order))``.

    Same result as ``dedup_deterministic`` (when ``order_by`` is a
    total order per group) but a fundamentally better 100 TB plan for
    high-duplication keys: min_by is partial-aggregable, so each map
    task pre-reduces its rows to ONE survivor candidate per key before
    the exchange — shuffle volume is O(distinct keys × map tasks)
    instead of O(all rows). The window form must shuffle every row to
    its key's partition and sort; this shuffles only per-task winners
    and never sorts. (Struct comparison is lexicographic by field —
    exactly the multi-column ORDER BY semantics.)"""
    payload = F.struct(*[F.col(c) for c in df.columns])
    order_key = F.struct(
        *[F.col(c) if isinstance(c, str) else c for c in order_by]
    )
    return (
        df.groupBy(*keys)
        .agg(F.min_by(payload, order_key).alias("__row"))
        .select([F.col(f"__row.{c}").alias(c) for c in df.columns])
    )
