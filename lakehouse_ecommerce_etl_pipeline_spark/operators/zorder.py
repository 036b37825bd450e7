"""True multi-dimensional Z-order (Morton) clustering.

The reference claims Z-ORDER optimization but ships no implementation
(README.md:119,137; docs/full_implementation_guide.md:317-321 —
qualitative claims only); `sources/table.py::optimize_table` provides
the linear-clustering approximation (repartitionByRange on the raw
keys). This module adds the real thing: an interleaved-bits Morton
code so range-partitioning on ONE derived column yields files whose
bounding boxes are tight in BOTH dimensions — the property min/max
data skipping needs for two-column predicates.

Cross-engine exactness: the Z-value is pure integer bit arithmetic
(`>> & <<` then OR), identical in Spark and DuckDB, so clustering
assignments are oracle-checkable bit-for-bit.

100 TB: Z-ordering is a write-time investment — one extra range
shuffle on the Morton column — that pays back on every read with a
two-column predicate: file-level min/max pruning skips files in BOTH
dimensions instead of one. The bit width bounds the grid (10 bits ⇒
1024 cells/dim); wider keys should be rank-bucketed first.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def zvalue_column(x: Column | str, y: Column | str, bits: int = 10) -> Column:
    """Morton code of two non-negative int columns, LSB-interleaved:
    bit i of x lands at position 2i, bit i of y at 2i+1."""
    xc = (F.col(x) if isinstance(x, str) else x).cast("bigint")
    yc = (F.col(y) if isinstance(y, str) else y).cast("bigint")
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(xc, i).bitwiseAND(1), 2 * i))
        parts.append(F.shiftleft(F.shiftright(yc, i).bitwiseAND(1), 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zvalue_sql(x: str, y: str, bits: int = 10) -> str:
    """DuckDB/ANSI twin of ``zvalue_column`` (same bit layout)."""
    parts = []
    for i in range(bits):
        parts.append(f"(((CAST({x} AS BIGINT) >> {i}) & 1) << {2 * i})")
        parts.append(f"(((CAST({y} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(parts)


def zorder_cluster(df, x: str, y: str, bits: int = 10, n_files: int | None = None):
    """Range-partition + sort a DataFrame by its Morton code — the
    write-side OPTIMIZE ZORDER BY (x, y). One shuffle; each output
    file covers a compact square-ish region of the (x, y) grid."""
    z = zvalue_column(x, y, bits).alias("__zval")
    out = df.withColumn("__zval", z)
    n = n_files or out.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return (
        out.repartitionByRange(int(n), "__zval")
        .sortWithinPartitions("__zval")
        .drop("__zval")
    )
