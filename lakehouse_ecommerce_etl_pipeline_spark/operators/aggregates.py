"""Aggregation operators + oracle-exact numeric helpers.

The reference's only aggregates are dedup/distinct/count (SURVEY.md
§2.5); the analytical tier (what its Athena zone exists to serve —
README.md:30) adds group-by aggregation, rollup/cube/grouping sets,
count-distinct and approximate variants.

Oracle-exactness: summing IEEE doubles is order-dependent, and Spark's
partial-aggregation order differs from any other engine's. Every SUM/
AVG over a double column therefore routes through DecimalType first —
decimal arithmetic is exact and associative, so Spark and DuckDB agree
bit-for-bit; the final cast back to double is deterministic. This is
also the right call at 100 TB: decimal sums are still map-side partial
aggregates (one shuffle), and exactness means re-runs/retries can be
compared byte-for-byte.

100 TB notes: plain ``groupBy(...).agg(...)`` is hash aggregation with
map-side combine — one shuffle on the grouping key, AQE coalesces the
post-shuffle partitions. ``count(distinct)`` over high-cardinality keys
is a double shuffle (expand + final) — prefer ``approx_count_distinct``
(HLL++, single pass, mergeable sketches) when 2-3% error is fine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# wide enough for price-like doubles at 100 TB row counts
_SUM_DECIMAL = "decimal(30,8)"


def dsum(col: Column | str, alias: str) -> Column:
    """Exact, engine-portable SUM over a double column.

    cast → decimal(30,8) → sum (exact, associative) → double.
    Matching oracle SQL: ``CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_SUM_DECIMAL)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Exact-until-final-division AVG: decimal sum / count in double.

    Matching oracle SQL:
    ``CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(_SUM_DECIMAL)).cast("double") / F.count(c)
    ).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """The DuckDB/ANSI twin of ``dsum`` for oracle strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,8))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    """The DuckDB/ANSI twin of ``davg``."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(30,8))) AS DOUBLE) / COUNT({expr}) "
        f"AS {alias}"
    )
