from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_ecommerce_etl_pipeline_spark.sources.pydatasource import (
    register_jsonl_sink,
)

SF0001 = "/root/testdata/sf0.001"


def _drain(spark, raw, out, ckpt):
    stream = (
        spark.readStream.schema("k bigint, v string")
        .parquet(raw)
    )
    q = (
        stream.writeStream.format("pyjsonl")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _read_rows(spark, out):
    return {
        (r["k"], r["v"])
        for r in spark.read.schema("k bigint, v string").json(out).collect()
    }


def test_stream_writer_exactly_once_across_restarts(spark, tmp_path):
    register_jsonl_sink(spark)
    raw = str(tmp_path / "raw")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(raw)

    batch1 = [(i, f"v{i}") for i in range(50)]
    spark.createDataFrame(batch1, "k bigint, v string").coalesce(1).write.mode(
        "append"
    ).parquet(raw)
    _drain(spark, raw, out, ckpt)
    assert _read_rows(spark, out) == set(batch1)

    # restart with no new data: no duplicate rows appear
    _drain(spark, raw, out, ckpt)
    assert _read_rows(spark, out) == set(batch1)

    # a second file lands; only its rows are appended
    batch2 = [(i, f"w{i}") for i in range(100, 130)]
    spark.createDataFrame(batch2, "k bigint, v string").coalesce(1).write.mode(
        "append"
    ).parquet(raw)
    _drain(spark, raw, out, ckpt)
    assert _read_rows(spark, out) == set(batch1) | set(batch2)

    # the manifest accounts for every written row, one line per batch
    manifest = os.path.join(out, "_STREAM_MANIFEST.jsonl")
    with open(manifest) as f:
        lines = [json.loads(ln) for ln in f.read().splitlines() if ln]
    assert sum(ln["rows"] for ln in lines) == len(batch1) + len(batch2)
    batches = [ln["batch"] for ln in lines]
    assert len(batches) == len(set(batches))
    for ln in lines:
        for path in ln["files"]:
            assert os.path.exists(path)
