"""Aggregation operators + oracle-exact numeric helpers.

The reference's only aggregates are dedup/distinct/count (SURVEY.md
§2.5); the analytical tier (what its Athena zone exists to serve —
README.md:30) adds group-by aggregation, rollup/cube/grouping sets,
count-distinct and approximate variants.

Oracle-exactness (DESIGN §21, round 11): summing IEEE doubles is
order-dependent, and Spark's partial-aggregation order differs from
any other engine's.  Every SUM/AVG over a 2-dp money/measure double
column therefore routes through the BIGINT integer-cents lattice:
snap to cents ONCE at the scan (``ROUND(x*100)`` — a 2-dp-valued
double times 100 lands within ~4e-3 of an integer, never near a .5
tie, so Spark's HALF_UP and DuckDB's binary half-away agree), sum as
exact int64 (associative — partial aggregation order cannot matter),
and divide by 100.0 once at the end.  The previous decimal(30,8)
path was value-identical on correctly-rounded engine builds, but a
bare double→DECIMAL cast's rounding path is engine-BUILD-sensitive
(numeric-portability rule 3; the q_kfold_assign red row in
CORRECTNESS_r10) — the integer lattice removes decimal typing rules
from both engines entirely.  Values are bit-identical to the old
path while group totals stay ≤ 2^53 cents (~$90 trillion/group): the
cents sum is an exact int64, its double cast is correctly rounded,
and /100.0 performs the single correctly-rounded division the old
decimal→double cast performed.

CONTRACT: the column argument must be a BARE 2-dp-valued double
column (all nine double columns in the driver testdata are 2-dp —
verified by scripts/numeric_portability_audit.py's schema
cross-check).  Do NOT pass computed expressions: a product/ratio has
real digits at the cents position, so ROUND would tie-break
differently across engines — use an explicit product lattice
instead (e.g. cents × basis-points, see plans/analytics35.py).

100 TB notes: plain ``groupBy(...).agg(...)`` is hash aggregation with
map-side combine — one shuffle on the grouping key, AQE coalesces the
post-shuffle partitions. ``count(distinct)`` over high-cardinality keys
is a double shuffle (expand + final) — prefer ``approx_count_distinct``
(HLL++, single pass, mergeable sketches) when 2-3% error is fine.
int64 headroom: 1.5e11 rows × ~2.3e6 avg cents ≈ 3.5e17 ≪ 2^63 even
for a single global sum over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Snap a 2-dp-valued double column onto the BIGINT cents
    lattice (the portable exact representation, DESIGN §21)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("bigint")


def dsum(col: Column | str, alias: str) -> Column:
    """Exact, engine-portable SUM over a bare 2-dp double column.

    ROUND(x*100) → BIGINT → sum (exact int64, associative) → double
    → /100.0.  Matching oracle SQL:
    ``CAST(SUM(CAST(ROUND(x*100) AS BIGINT)) AS DOUBLE) / 100.0``.
    """
    return (F.sum(cents(col)).cast("double") / F.lit(100.0)).alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Exact-until-final-division AVG: cents sum / 100.0 / count.

    Matching oracle SQL:
    ``CAST(SUM(CAST(ROUND(x*100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(cents(c)).cast("double") / F.lit(100.0) / F.count(c)
    ).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """The DuckDB/ANSI twin of ``dsum`` for oracle strings.  ``expr``
    must be a bare 2-dp double column (see module contract)."""
    return (
        f"CAST(SUM(CAST(ROUND({expr} * 100) AS BIGINT)) AS DOUBLE) / 100.0 "
        f"AS {alias}"
    )


def sql_davg(expr: str, alias: str) -> str:
    """The DuckDB/ANSI twin of ``davg``."""
    return (
        f"CAST(SUM(CAST(ROUND({expr} * 100) AS BIGINT)) AS DOUBLE) / 100.0 "
        f"/ COUNT({expr}) AS {alias}"
    )
