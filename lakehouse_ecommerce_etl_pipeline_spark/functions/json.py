"""JSON extraction over string columns (extension tier).

The `events.props` column is a JSON string; extraction stays JVM-side
via ``get_json_object``/``from_json`` — no Python in the hot path.

100 TB: prefer ``from_json`` with an explicit schema when extracting
several fields (one parse per row) over repeated ``get_json_object``
calls (one parse per field per row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def json_get(col: Column | str, path: str) -> Column:
    """Extract one field as string: ``get_json_object(col, '$.path')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{path}")


def parse_props(
    df: DataFrame, col: str, schema: T.StructType, out_col: str = "props_parsed"
) -> DataFrame:
    """Single-parse multi-field extraction with an explicit schema."""
    return df.withColumn(out_col, F.from_json(F.col(col), schema))
