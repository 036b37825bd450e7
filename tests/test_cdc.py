"""CDF between managed-table versions: publish v1, merge changes →
v2, assert read_changes reconstructs exactly the applied delta."""

from __future__ import annotations

from lakehouse_ecommerce_etl_pipeline_spark.operators.cdc import read_changes
from lakehouse_ecommerce_etl_pipeline_spark.sinks.merge import merge_upsert
from lakehouse_ecommerce_etl_pipeline_spark.sources import table as managed


def test_read_changes_between_versions(spark, tmp_path):
    path = str(tmp_path / "t")
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, s string, v double"
    )
    managed.write(spark, v1, path)
    # update k=2, insert k=4 (merge keeps k=1,3 untouched)
    src = spark.createDataFrame([(2, "B", 25.0), (4, "d", 40.0)], "k int, s string, v double")
    merge_upsert(spark, path, src, ["k"])

    changes = read_changes(spark, path, 1, 2, ["k"]).collect()
    by_type: dict[str, set] = {}
    for r in changes:
        by_type.setdefault(r._change_type, set()).add((r.k, r.s, r.v))
    assert by_type["insert"] == {(4, "d", 40.0)}
    assert by_type["update_preimage"] == {(2, "b", 20.0)}
    assert by_type["update_postimage"] == {(2, "B", 25.0)}
    assert "delete" not in by_type  # merge never deletes


def test_read_changes_detects_deletes(spark, tmp_path):
    path = str(tmp_path / "t2")
    managed.write(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string"),
        path,
    )
    managed.write(
        spark, spark.createDataFrame([(1, "a")], "k int, s string"), path
    )
    changes = read_changes(spark, path, 1, 2, ["k"]).collect()
    assert {(r.k, r._change_type) for r in changes} == {(2, "delete")}
