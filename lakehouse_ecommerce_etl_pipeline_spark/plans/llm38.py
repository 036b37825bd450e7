"""LLM tier XXXVIII: protobuf delimited streams — the event-bus
interchange format (Kafka/gRPC payloads) as export + scan.

The spark-protobuf jar and compiled descriptors are absent from this
runtime (probed), so sources/proto.py implements the published wire
format directly (varint base-128, tag bytes, writeDelimitedTo
framing), the way the Avro/WARC/xlsx sources do for their specs.

Oracle strategy mirrors the Avro tier verbatim: per-record encoded
sizes are closed-form varint arithmetic (an off-by-one in a length
prefix or a wrong tag byte breaks the digit-exact equality), and the
scan proves full export→import identity against the original table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import (
    artifact_fresh,
    artifact_lock,
    load,
    work_dir,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans.llm30 import _varlen
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register
from lakehouse_ecommerce_etl_pipeline_spark.sources.proto import (
    scan_proto,
    write_proto_files,
)

_N_FILES = 8


@register(
    "q_export_protobuf",
    oracle=f"""
    WITH m AS (
      SELECT CAST(doc_id % {_N_FILES} AS INTEGER) AS file_id,
             CAST(strlen(text) AS BIGINT) AS sz,
             doc_id AS uid
      FROM documents
    )
    SELECT file_id,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(SUM(2 + {_varlen('uid')} + {_varlen('sz')} + sz) AS BIGINT)
             AS record_bytes
    FROM m GROUP BY file_id
    """,
)
def q_export_protobuf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus → {_N_FILES} deterministic length-delimited .pb streams;
    per-file stats where ``record_bytes`` sums each message's wire
    size — two single-byte tags + varint(doc_id) + varint(len) +
    utf-8 payload — and the oracle restates that varint arithmetic in
    pure SQL (protobuf int64 field 1 is an unprefixed uvarint, unlike
    Avro's zigzag, so the oracle's argument is the RAW id).

    100 TB: one applyInPandas group per file (size-bound the files in
    production); protobuf streams are not splittable, so export-side
    file count IS downstream scan parallelism — exactly the knob this
    writer exposes."""
    return (
        write_proto_files(
            load(spark, sf_dir, "documents").select("doc_id", "text"),
            n_files=_N_FILES,
        )
        .select("file_id", "n_records", "record_bytes")
    )


@register(
    "q_scan_protobuf",
    oracle="""
    SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS content_hash
    FROM documents
    """,
)
def q_scan_protobuf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INGEST side: materialize the corpus as delimited .pb streams
    once (mtime-guarded scratch), scan back distributedly
    (binaryFile → varint walker in mapInPandas), and prove the
    export→import identity — every message returns byte-for-byte
    through tag dispatch + varint decode, oracle recomputed from the
    ORIGINAL table."""
    src = os.path.join(sf_dir, "documents.parquet")
    out = os.path.join(work_dir(sf_dir, "proto_files"), "streams")
    with artifact_lock(out):
        if not artifact_fresh(src, out):
            write_proto_files(
                load(spark, sf_dir, "documents").select("doc_id", "text"),
                n_files=_N_FILES,
                out_dir=out,
            ).collect()  # stat rows — the action that writes the files
    recs = scan_proto(spark, out)
    return recs.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.md5("text").alias("content_hash"),
    )


@register(
    "q_stream_protobuf_ingest",
    oracle="""
    SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS content_hash
    FROM documents
    """,
)
def q_stream_protobuf_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drop-zone pattern over protobuf wire streams as REAL
    Structured Streaming (the Avro tier's q_stream_avro_ingest, at the
    other wire format): a file stream watches the .pb directory, every
    discovered stream decodes through the same mapInPandas varint
    walker, availableNow drains the backlog into a parquet sink
    through a checkpoint, and the identity oracle holds regardless of
    micro-batch split — ingest correctness is batching-invariant.

    100 TB: file-source streams scale by file count
    (maxFilesPerTrigger); only source-discovery state checkpoints —
    the decode is stateless."""
    import uuid

    from lakehouse_ecommerce_etl_pipeline_spark.sources.proto import (
        stream_scan_proto,
    )

    src = os.path.join(sf_dir, "documents.parquet")
    streams = os.path.join(work_dir(sf_dir, "proto_files"), "streams")
    with artifact_lock(streams):
        if not artifact_fresh(src, streams):
            write_proto_files(
                load(spark, sf_dir, "documents").select("doc_id", "text"),
                n_files=_N_FILES,
                out_dir=streams,
            ).collect()
    run = os.path.join(
        work_dir(sf_dir, "proto_stream"), uuid.uuid4().hex[:8]
    )
    sink, ckpt = os.path.join(run, "sink"), os.path.join(run, "ckpt")
    q = (
        stream_scan_proto(spark, streams)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(sink).select(
        "doc_id",
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.md5("text").alias("content_hash"),
    )
