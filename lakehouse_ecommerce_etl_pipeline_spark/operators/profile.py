"""Table profiling — the ANALYZE TABLE / data-quality statistics pass
(per-column null counts, distinct counts, min/max) in a type-uniform
long layout.

Layout choice: one UNION ALL branch per column, each aggregating a
single column, instead of one wide aggregate row unpivoted after.
Two reasons: parquet column pruning makes each branch a one-column
scan (branches parallelize as independent stages), and N-column
MIN/MAX in one aggregate generates pathological whole-stage codegen
(observed 19-35 s compiles — see docs/DESIGN.md). Numerics and
timestamps surface as doubles (micro epochs for timestamps); strings
keep their own min/max columns — no cross-engine number formatting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _branch(df: DataFrame, c: str) -> DataFrame:
    dt = df.schema[c].dataType
    col = F.col(c)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        # NTZ micros == instant micros under the pinned-UTC session
        num = F.unix_micros(col.cast("timestamp")).cast("double")
    elif isinstance(dt, (T.NumericType, T.BooleanType)):
        num = col.cast("double")
    else:
        num = F.lit(None).cast("double")
    is_str = isinstance(dt, T.StringType)
    s = col if is_str else F.lit(None).cast("string")
    return df.select(col, num.alias("__n"), s.alias("__s")).agg(
        F.lit(c).alias("column_name"),
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
        F.countDistinct(col).alias("n_distinct"),
        F.min("__n").alias("min_num"),
        F.max("__n").alias("max_num"),
        F.min("__s").alias("min_str"),
        F.max("__s").alias("max_str"),
    )


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One stats row per column: (column_name, n_rows, n_nulls,
    n_distinct, min_num, max_num, min_str, max_str)."""
    cols = columns or df.columns
    out = _branch(df, cols[0])
    for c in cols[1:]:
        out = out.unionByName(_branch(df, c))
    return out
