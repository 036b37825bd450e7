"""End-to-end pipeline test per FIXTURES.md §A4: run the three-dataset
DAG over dirty fixtures, assert PK uniqueness, FK closure, rejected
counts, and idempotency (second run is a marker-skip no-op)."""

from __future__ import annotations

import os

from lakehouse_ecommerce_etl_pipeline_spark.pipeline import run_pipeline
from lakehouse_ecommerce_etl_pipeline_spark.pipeline.driver import table_path
from lakehouse_ecommerce_etl_pipeline_spark.sinks.quarantine import quarantine_path
from lakehouse_ecommerce_etl_pipeline_spark.sources import table as managed


def _snapshot(spark, base, dataset, drop=("ingestion_timestamp",)):
    df = managed.read(spark, table_path(base, dataset))
    return sorted(
        tuple(row) for row in df.drop(*drop).collect()
    )


def test_pipeline_end_to_end(spark, raw_zone):
    results = run_pipeline(spark, raw_zone)

    # products: 8 raw - 2 null-rejects = 6 valid, -1 dup = 5 loaded
    assert results["products"] == {"loaded": 5, "rejected": 2}

    # orders: 20 good + 3 dirty (1 dup-key merged, 2 null-rejects) → 20
    assert results["orders"]["loaded"] == 20
    assert results["orders"]["rejected"] == 2

    # order_items: 40 good + dup(i0 merged) + null reject + 2 FK rejects
    assert results["order_items"]["loaded"] == 40
    assert results["order_items"]["rejected"] == 3

    orders = managed.read(spark, table_path(raw_zone, "orders"))
    items = managed.read(spark, table_path(raw_zone, "order_items"))
    products = managed.read(spark, table_path(raw_zone, "products"))

    # PK uniqueness
    for df, k in [(orders, "order_id"), (items, "id"), (products, "product_id")]:
        assert df.count() == df.select(k).distinct().count()

    # FK closure of order_items
    assert items.join(orders, "order_id", "left_anti").count() == 0
    assert items.join(products, "product_id", "left_anti").count() == 0

    # audit/typed columns present
    assert dict(orders.dtypes)["total_amount"] == "decimal(12,2)"
    assert dict(orders.dtypes)["date"] == "date"
    assert dict(items.dtypes)["reordered"] == "boolean"

    # quarantine tables hold the rejects with reasons
    rej = managed.read(spark, quarantine_path(table_path(raw_zone, "order_items")))
    reasons = sorted(r.rejection_reason for r in rej.collect())
    assert reasons == [
        "FK violation: order_id",
        "FK violation: product_id",
        "Missing required fields",
    ]

    # raw files archived, raw zone drained
    assert os.listdir(os.path.join(raw_zone, "raw", "orders")) == []
    assert len(os.listdir(os.path.join(raw_zone, "archived", "orders"))) == 1

    # idempotency: rerun is a marker-skip no-op (nothing to discover,
    # markers present) — tables byte-identical
    before = {d: _snapshot(spark, raw_zone, d) for d in ("products", "orders", "order_items")}
    results2 = run_pipeline(spark, raw_zone)
    assert results2 == {}  # nothing new processed
    after = {d: _snapshot(spark, raw_zone, d) for d in ("products", "orders", "order_items")}
    assert before == after


def test_pipeline_marker_skip_on_restored_file(spark, raw_zone, tmp_path):
    """A file that reappears after processing is skipped via the marker
    log (the reference's *intended* O1 semantics)."""
    run_pipeline(spark, raw_zone)
    # restore the archived products file into raw/
    src = os.path.join(raw_zone, "archived", "products", "products.csv")
    dst = os.path.join(raw_zone, "raw", "products", "products.csv")
    import shutil

    shutil.copy(src, dst)
    results = run_pipeline(spark, raw_zone)
    assert results == {}  # marker hit → skipped
    assert os.path.exists(dst)  # not re-archived
