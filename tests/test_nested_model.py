"""Nested/denormalized model (plans/analytics41.py): the schema-
pruning PLAN property — reading one leaf of the item struct must scan
only that leaf — plus build losslessness at the count level."""

from __future__ import annotations

import contextlib
import io

from lakehouse_ecommerce_etl_pipeline_spark.plans import queries
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics41 import (
    nested_orders,
)

SF0001 = "/root/testdata/sf0.001"


def _read_schema_lines(df) -> list[str]:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return [
        line.strip()
        for line in buf.getvalue().splitlines()
        if "ReadSchema" in line
    ]


def test_nested_scan_prunes_to_quantity_leaf(spark):
    df = queries()["q_nested_field_pruning"](spark, SF0001)
    schemas = [s for s in _read_schema_lines(df) if "items" in s]
    assert schemas, "expected a scan reading the items column"
    for s in schemas:
        assert "quantity" in s
        # the pruned scan must NOT read the other three leaves
        for leaf in ("partkey", "price", "linenumber"):
            assert leaf not in s, f"unpruned leaf {leaf} in {s}"


def test_nested_build_is_lossless(spark):
    n = nested_orders(spark, SF0001)
    import pyspark.sql.functions as F

    n_items = (
        n.filter(F.col("items").isNotNull())
        .select(F.sum(F.size("items")))
        .first()[0]
    )
    lineitem_rows = spark.read.parquet(
        f"{SF0001}/lineitem.parquet"
    ).count()
    assert n_items == lineitem_rows
