from __future__ import annotations

import pytest

from lakehouse_ecommerce_etl_pipeline_spark.sinks.merge import merge_upsert
from lakehouse_ecommerce_etl_pipeline_spark.sources import table as managed


def test_time_travel_and_history(spark, tmp_path):
    path = str(tmp_path / "tt")
    managed.write(spark, spark.createDataFrame([(1,)], "v int"), path)
    managed.write(spark, spark.createDataFrame([(1,), (2,)], "v int"), path)
    assert managed.history(path) == [1, 2]
    assert managed.read(spark, path).count() == 2
    assert managed.read(spark, path, version=1).count() == 1
    with pytest.raises(FileNotFoundError):
        managed.read(spark, path, version=9)


def test_compact_and_vacuum(spark, tmp_path):
    path = str(tmp_path / "cv")
    df = spark.range(1000).selectExpr("id", "id % 7 AS k").repartition(16)
    managed.write(spark, df, path)
    managed.compact(spark, path, target_partitions=2, zorder_by=["k"])
    assert managed.history(path) == [1, 2]
    after = managed.read(spark, path)
    assert after.count() == 1000
    # clustering: each file holds a contiguous k-range → per-partition
    # distinct k counts shrink vs random layout
    removed = managed.vacuum(path, keep_last=1)
    assert removed == [1]
    assert managed.read(spark, path).count() == 1000


def test_merge_schema_evolution(spark, tmp_path):
    path = str(tmp_path / "ev")
    managed.write(
        spark, spark.createDataFrame([("k1", 1), ("k2", 2)], "k string, v int"), path
    )
    src = spark.createDataFrame([("k2", 20, "new"), ("k3", 30, "col")],
                                "k string, v int, extra string")
    merge_upsert(spark, path, src, ["k"], evolve_schema=True)
    out = {r.k: (r.v, r.extra) for r in managed.read(spark, path).collect()}
    assert out == {"k1": (1, None), "k2": (20, "new"), "k3": (30, "col")}
