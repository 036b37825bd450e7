from __future__ import annotations

from pyspark.sql import types as T

from lakehouse_ecommerce_etl_pipeline_spark.sinks.catalog import (
    count_star,
    register_table_external,
)
from lakehouse_ecommerce_etl_pipeline_spark.sources import table as managed
from lakehouse_ecommerce_etl_pipeline_spark.sources.files import (
    read_csv_with_corrupt_capture,
)


def test_register_external_follows_snapshots(spark, tmp_path):
    path = str(tmp_path / "cat")
    managed.write(spark, spark.range(10).selectExpr("id"), path)
    snap1 = managed.snapshot_dir(path, 1)
    full = register_table_external(spark, snap1, "t_ext", database="testdb")
    assert count_star(spark, full) == 10
    # publish v2, re-register → catalog follows
    managed.write(spark, spark.range(25).selectExpr("id"), path)
    register_table_external(spark, managed.snapshot_dir(path, 2), "t_ext", "testdb")
    assert count_star(spark, full) == 25
    assert spark.sql(f"SELECT MAX(id) AS m FROM {full}").collect()[0].m == 24
    spark.sql("DROP TABLE testdb.t_ext")


def test_corrupt_record_capture(spark, tmp_path):
    p = tmp_path / "dirty.csv"
    p.write_text(
        "a,b\n"
        "1,x\n"
        "not_an_int,y\n"   # a fails the int schema → corrupt
        "3,z\n"
    )
    schema = T.StructType(
        [T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())]
    )
    df = read_csv_with_corrupt_capture(spark, str(p), schema)
    rows = df.collect()
    good = [(r.a, r.b) for r in rows if r._corrupt_record is None]
    bad = [r._corrupt_record for r in rows if r._corrupt_record is not None]
    assert sorted(good) == [(1, "x"), (3, "z")]
    assert bad == ["not_an_int,y"]
