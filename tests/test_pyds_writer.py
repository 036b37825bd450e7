"""Python DataSource batch SINK (sources/pydatasource.py writer face):
lossless round-trip, manifest contract, overwrite semantics, and file
layout (one part per input partition, no torn temp files)."""

from __future__ import annotations

import json
import os

from lakehouse_ecommerce_etl_pipeline_spark.sources.pydatasource import (
    register_jsonl_sink,
)


def _write(spark, df, path):
    register_jsonl_sink(spark)
    df.write.format("pyjsonl").option("path", str(path)).mode(
        "overwrite"
    ).save()


def test_roundtrip_and_manifest(spark, tmp_path):
    path = tmp_path / "out"
    df = spark.range(0, 1000).selectExpr(
        "id", "id * 2 AS dbl", "CAST(id AS STRING) AS s"
    ).repartition(4)
    _write(spark, df, path)

    # manifest: every part accounted for, row total exact
    manifest = json.load(open(path / "_MANIFEST.json"))
    assert manifest["rows"] == 1000
    assert len(manifest["files"]) == 4
    parts = sorted(
        f for f in os.listdir(path) if f.startswith("part-")
    )
    assert [os.path.basename(p) for p in manifest["files"]] == parts
    # no in-progress temp files survive a successful commit
    assert not [f for f in os.listdir(path) if f.endswith(".inprogress")]

    back = spark.read.schema("id bigint, dbl bigint, s string").json(
        str(path)
    )
    assert back.count() == 1000
    assert back.selectExpr("sum(id)", "sum(dbl)").first() == (
        499500,
        999000,
    )


def test_overwrite_replaces_previous_output(spark, tmp_path):
    path = tmp_path / "out"
    _write(spark, spark.range(0, 50).repartition(8), path)
    _write(spark, spark.range(0, 10).repartition(2), path)
    manifest = json.load(open(path / "_MANIFEST.json"))
    assert manifest["rows"] == 10
    back = spark.read.schema("id bigint").json(str(path))
    assert back.count() == 10


def test_empty_partitions_write_empty_parts(spark, tmp_path):
    path = tmp_path / "out"
    # 1 row across 4 partitions: 3 empty partitions still commit
    _write(spark, spark.range(0, 1).repartition(4), path)
    manifest = json.load(open(path / "_MANIFEST.json"))
    assert manifest["rows"] == 1
    back = spark.read.schema("id bigint").json(str(path))
    assert back.collect() == [(0,)]
