"""Sort / limit / top-k (extension tier — SURVEY.md §2.7).

100 TB: global ``orderBy`` is a range-partitioned total sort (sampling
pass + shuffle) — reserve it for final outputs. ``orderBy(...).limit(k)``
is NOT a full sort: Spark plans TakeOrderedAndProject, a per-partition
top-k heap + driver merge, O(n) with tiny k — the right global top-k at
any scale. Per-group top-k lives in operators/windows.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def sort(df: DataFrame, order_by: Sequence[Column | str]) -> DataFrame:
    return df.orderBy(*order_by)


def top_k(df: DataFrame, order_by: Sequence[Column | str], k: int) -> DataFrame:
    """Global top-k — plans as TakeOrderedAndProject (no total sort).
    ``order_by`` should totally order rows for deterministic output."""
    return df.orderBy(*order_by).limit(k)
