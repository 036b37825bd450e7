from __future__ import annotations

import datetime as dt
import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_ecommerce_etl_pipeline_spark.session import get_spark
from lakehouse_ecommerce_etl_pipeline_spark.sources.excel import write_fake_workbook

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", shuffle_partitions=8)
    yield s


@pytest.fixture()
def raw_zone(tmp_path):
    """Dirty reference-domain fixtures per FIXTURES.md §A: products CSV
    (nulls + dups), orders workbook (2 good sheets + 1 missing-column
    sheet, dup/null keys), order_items workbook (dangling FKs)."""
    base = tmp_path / "lake"
    (base / "raw" / "products").mkdir(parents=True)
    (base / "raw" / "orders").mkdir(parents=True)
    (base / "raw" / "order_items").mkdir(parents=True)

    # products.csv: 8 rows; 1 dup key, 2 null-field rejects
    products = pd.DataFrame(
        {
            "product_id": ["p1", "p2", "p3", "p3", "p4", None, "p6", "p7"],
            # nullable Int64 so the CSV holds "1", not "1.0" (the
            # declared IntegerType schema would null out float strings)
            "department_id": pd.array([1, 1, 2, 2, 2, 3, None, 3], dtype="Int64"),
            "department": ["toys", "toys", "food", "food", "food", "toys", "home", "home"],
            "product_name": ["car", "ball", "jam", "jam2", "tea", "ghost", "lamp", "rug"],
        }
    )
    products.to_csv(base / "raw" / "products" / "products.csv", index=False)

    t0 = dt.datetime(2025, 4, 1, 12, 0, 0)
    rows = []
    for i in range(20):
        rows.append(
            {
                "order_num": f"n{i}",
                "order_id": f"o{i}",
                "user_id": f"u{i % 5}",
                "order_timestamp": t0 + dt.timedelta(hours=i),
                "total_amount": 10.5 + i,
            }
        )
    orders_pdf = pd.DataFrame(rows)
    # dirt: dup key o1, null order_id, null user_id
    dirty = pd.DataFrame(
        [
            {"order_num": "nd1", "order_id": "o1", "user_id": "u9",
             "order_timestamp": t0, "total_amount": 99.0},
            {"order_num": "nd2", "order_id": None, "user_id": "u9",
             "order_timestamp": t0, "total_amount": 1.0},
            {"order_num": "nd3", "order_id": "o98", "user_id": None,
             "order_timestamp": t0, "total_amount": 1.0},
        ]
    )
    bad_sheet = orders_pdf.head(3).drop(columns=["order_timestamp"])
    write_fake_workbook(
        str(base / "raw" / "orders" / "orders_apr_2025.bundle"),
        {
            "Sheet1": orders_pdf.head(10),
            "Sheet2": pd.concat([orders_pdf.tail(10), dirty]),
            "summary": bad_sheet,  # skipped: missing required column
        },
    )

    items = []
    for i in range(40):
        items.append(
            {
                "id": f"i{i}",
                "order_id": f"o{i % 20}",
                "user_id": f"u{i % 5}",
                "days_since_prior_order": i % 7,
                "product_id": ["p1", "p2", "p3", "p4"][i % 4],
                "add_to_cart_order": i % 3,
                "reordered": i % 2,
                "order_timestamp": t0 + dt.timedelta(hours=i % 20),
            }
        )
    items_pdf = pd.DataFrame(items)
    dirty_items = pd.DataFrame(
        [
            # dangling order FK
            {"id": "ix1", "order_id": "o_missing", "user_id": "u1",
             "days_since_prior_order": 1, "product_id": "p1",
             "add_to_cart_order": 1, "reordered": 0, "order_timestamp": t0},
            # dangling product FK
            {"id": "ix2", "order_id": "o1", "user_id": "u1",
             "days_since_prior_order": 1, "product_id": "p_missing",
             "add_to_cart_order": 1, "reordered": 0, "order_timestamp": t0},
            # null required field
            {"id": None, "order_id": "o1", "user_id": "u1",
             "days_since_prior_order": 1, "product_id": "p1",
             "add_to_cart_order": 1, "reordered": 0, "order_timestamp": t0},
            # dup key i0
            {"id": "i0", "order_id": "o0", "user_id": "u0",
             "days_since_prior_order": 0, "product_id": "p1",
             "add_to_cart_order": 0, "reordered": 1, "order_timestamp": t0},
        ]
    )
    write_fake_workbook(
        str(base / "raw" / "order_items" / "order_items_apr_2025.bundle"),
        {"Sheet1": pd.concat([items_pdf, dirty_items])},
    )
    return str(base)
