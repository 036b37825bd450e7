"""Set operations.

reference: glue_jobs/product_etl.py:58 (``df_raw.subtract(df_valid)``
— EXCEPT DISTINCT semantics, preserved here) and
glue_jobs/orders_etl.py:71 (``pd.concat`` of per-sheet frames — a bag
UNION ALL, preserved as ``union_all``).

100 TB: EXCEPT/INTERSECT shuffle both sides on all columns — prefer
predicate complements (operators/validate.py) when the membership test
is expressible as a filter. ``union_all`` is metadata-only (no
shuffle); ``unionByName`` tolerates column-order drift between
batches, which matters for multi-sheet/multi-file ingestion.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def except_distinct(left: DataFrame, right: DataFrame) -> DataFrame:
    """EXCEPT DISTINCT — the reference's ``subtract`` (product_etl.py:58)."""
    return left.subtract(right)


def except_all(left: DataFrame, right: DataFrame) -> DataFrame:
    """Bag EXCEPT ALL (multiplicity-aware)."""
    return left.exceptAll(right)


def intersect_distinct(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.intersect(right)


def intersect_all(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.intersectAll(right)


def union_all(*dfs: DataFrame, allow_missing_columns: bool = False) -> DataFrame:
    """UNION ALL by column name across any number of frames.

    reference: orders_etl.py:71 / order_items_etl.py:97 (sheet concat).
    """
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing_columns), dfs
    )
