"""Avro Object Container Files (OCF) — pure-Python source + writer.

Spark's own `avro` datasource is an EXTERNAL module whose jar is not
deployed in this runtime (verified by probe — `Failed to find data
source: avro`), so this implements the published Avro 1.11 spec
directly, the same way sources/xlsx.py implements SpreadsheetML and
sources/warc.py implements ISO 28500:

- binary encoding: zigzag varint longs/ints, length-prefixed utf-8
  strings / bytes, little-endian IEEE doubles, 1-byte booleans,
  2-branch ``["null", T]`` unions (union index varint, then branch);
- container framing: ``Obj\\x01`` magic, file-metadata map
  (``avro.schema`` JSON + ``avro.codec``), 16-byte sync marker, then
  blocks of (record-count varint, byte-size varint, payload, sync).
  Payloads may contain ANY bytes including fake sync markers — the
  byte-size varint is the only correct framing, exactly like WARC's
  Content-Length;
- codecs: ``null`` and ``deflate`` (RFC 1951 raw deflate — zlib with
  wbits=-15 per the spec).

Writer determinism (pinned meta order, sync marker = md5 of the file
id, ascending-id record order) is what lets the driver value-oracle a
binary format: per-record encoded sizes are closed-form varint
arithmetic an ANSI-SQL twin can restate digit-exactly.

100 TB: one OCF per ``applyInPandas`` group on the write side; on the
read side ``binaryFile`` distributes whole containers (blocks are
sequential within a file — the file is the parallelism unit) and the
block walker runs in ``mapInPandas`` Arrow batches. Nothing shuffles
until the caller does.
"""

from __future__ import annotations

import hashlib
import io
import json
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"Obj\x01"


# ------------------------------------------------------ primitives

def zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def write_varint(u: int) -> bytes:
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def write_long(n: int) -> bytes:
    return write_varint(zigzag(n))


def read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return u, pos
        shift += 7


def read_long(buf: memoryview, pos: int) -> tuple[int, int]:
    u, pos = read_varint(buf, pos)
    return unzigzag(u), pos


def write_string(s: str) -> bytes:
    raw = s.encode("utf-8")
    return write_long(len(raw)) + raw


def write_bytes(b: bytes) -> bytes:
    return write_long(len(b)) + b


# ----------------------------------------------------- record codec
# supported field types: "long" | "int" | "string" | "double" |
# "boolean" | "bytes" | ["null", <primitive>]


def encode_value(ftype, v) -> bytes:
    if isinstance(ftype, list):  # ["null", T] union
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return write_long(ftype.index("null"))
        branch = next(i for i, t in enumerate(ftype) if t != "null")
        return write_long(branch) + encode_value(ftype[branch], v)
    if ftype in ("long", "int"):
        return write_long(int(v))
    if ftype == "string":
        return write_string(str(v))
    if ftype == "double":
        return struct.pack("<d", float(v))
    if ftype == "boolean":
        return b"\x01" if v else b"\x00"
    if ftype == "bytes":
        return write_bytes(bytes(v))
    raise ValueError(f"unsupported avro type: {ftype!r}")


def decode_value(ftype, buf: memoryview, pos: int):
    if isinstance(ftype, list):
        idx, pos = read_long(buf, pos)
        branch = ftype[idx]
        if branch == "null":
            return None, pos
        return decode_value(branch, buf, pos)
    if ftype in ("long", "int"):
        return read_long(buf, pos)
    if ftype == "string":
        n, pos = read_long(buf, pos)
        return str(buf[pos : pos + n], "utf-8"), pos + n
    if ftype == "double":
        return struct.unpack("<d", buf[pos : pos + 8])[0], pos + 8
    if ftype == "boolean":
        return buf[pos] == 1, pos + 1
    if ftype == "bytes":
        n, pos = read_long(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    raise ValueError(f"unsupported avro type: {ftype!r}")


def _schema_json(name: str, fields: list[tuple[str, object]]) -> str:
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [{"name": n, "type": t} for n, t in fields],
        },
        separators=(",", ":"),
        sort_keys=True,
    )


def sync_marker(file_id: int) -> bytes:
    """Deterministic per-file sync marker (re-exports are idempotent)."""
    return hashlib.md5(f"sync:{file_id}".encode()).digest()


def write_ocf(
    rows: list[tuple],
    fields: list[tuple[str, object]],
    file_id: int = 0,
    codec: str = "null",
    records_per_block: int = 1000,
    name: str = "row",
) -> bytes:
    """Serialize rows into one Avro OCF byte string. Deterministic:
    fixed meta order (codec then schema), md5-derived sync marker,
    caller-supplied row order."""
    sync = sync_marker(file_id)
    buf = io.BytesIO()
    buf.write(MAGIC)
    meta = [
        ("avro.codec", codec.encode()),
        ("avro.schema", _schema_json(name, fields).encode()),
    ]
    buf.write(write_long(len(meta)))
    for k, v in meta:
        buf.write(write_string(k))
        buf.write(write_bytes(v))
    buf.write(write_long(0))  # end of metadata map
    buf.write(sync)
    for i in range(0, len(rows), records_per_block):
        chunk = rows[i : i + records_per_block]
        payload = b"".join(
            b"".join(encode_value(t, v) for (_, t), v in zip(fields, row))
            for row in chunk
        )
        if codec == "deflate":
            payload = zlib.compress(payload, 6)[2:-4]  # raw RFC 1951
        elif codec != "null":
            raise ValueError(f"unsupported codec: {codec}")
        buf.write(write_long(len(chunk)))
        buf.write(write_long(len(payload)))
        buf.write(payload)
        buf.write(sync)
    return buf.getvalue()


def parse_ocf(blob: bytes) -> tuple[list[dict], list[tuple[str, object]]]:
    """Walk one OCF byte string → (records as dicts, schema fields).
    Framing is byte-size-driven; the sync marker is VERIFIED after
    every block (corruption detection), never searched for."""
    buf = memoryview(blob)
    if bytes(buf[:4]) != MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        count, pos = read_long(buf, pos)
        if count == 0:
            break
        if count < 0:  # spec: negative count precedes a byte size
            _, pos = read_long(buf, pos)
            count = -count
        for _ in range(count):
            klen, pos = read_long(buf, pos)
            k = str(buf[pos : pos + klen], "utf-8")
            pos += klen
            vlen, pos = read_long(buf, pos)
            meta[k] = bytes(buf[pos : pos + vlen])
            pos += vlen
    schema = json.loads(meta["avro.schema"])
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    codec = meta.get("avro.codec", b"null").decode()
    sync = bytes(buf[pos : pos + 16])
    pos += 16
    records: list[dict] = []
    n = len(buf)
    while pos < n:
        count, pos = read_long(buf, pos)
        size, pos = read_long(buf, pos)
        payload = bytes(buf[pos : pos + size])
        pos += size
        if bytes(buf[pos : pos + 16]) != sync:
            raise ValueError(f"sync marker mismatch after block at {pos}")
        pos += 16
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        elif codec != "null":
            raise ValueError(f"unsupported codec: {codec}")
        pbuf = memoryview(payload)
        ppos = 0
        for _ in range(count):
            rec = {}
            for fname, ftype in fields:
                rec[fname], ppos = decode_value(ftype, pbuf, ppos)
            records.append(rec)
    return records, fields


# ------------------------------------------------- Spark integration

AVRO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.IntegerType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("record_bytes", T.LongType()),
        T.StructField("avro_bytes", T.LongType()),
    ]
)

_DOC_FIELDS: list[tuple[str, object]] = [
    ("doc_id", "long"),
    ("text", "string"),
]


def write_avro_files(
    docs: DataFrame,
    n_files: int = 8,
    out_dir: str | None = None,
    codec: str = "null",
) -> DataFrame:
    """Assign every document to ``doc_id % n_files``, write one OCF per
    group (ascending id order), optionally persist, return per-file
    stats. ``record_bytes`` is the sum of per-record binary-encoded
    sizes BEFORE compression — pure varint arithmetic the SQL oracle
    restates; ``avro_bytes`` is the container size actually produced."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        fid = int(pdf["__file"].iloc[0])
        rows = [(int(d), str(t)) for d, t in zip(pdf["doc_id"], pdf["text"])]
        blob = write_ocf(rows, _DOC_FIELDS, file_id=fid, codec=codec)
        rec_bytes = sum(
            len(write_long(d)) + len(write_long(len(t.encode()))) + len(t.encode())
            for d, t in rows
        )
        if out_dir is not None:
            import os

            os.makedirs(out_dir, exist_ok=True)
            tmp = f"{out_dir}/part_{fid:05d}.avro.tmp"
            with open(tmp, "wb") as fh:
                fh.write(blob)
            os.replace(tmp, f"{out_dir}/part_{fid:05d}.avro")
        return pd.DataFrame(
            [(fid, len(rows), rec_bytes, len(blob))],
            columns=["file_id", "n_records", "record_bytes", "avro_bytes"],
        )

    assigned = docs.select(
        "doc_id", "text", (F.col("doc_id") % n_files).cast("int").alias("__file")
    )
    return assigned.groupBy("__file").applyInPandas(
        build, schema=AVRO_STATS_SCHEMA
    )


AVRO_DOC_SCHEMA = T.StructType(
    [
        T.StructField("file_path", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _walk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for path, blob in zip(pdf["path"], pdf["content"]):
            records, _ = parse_ocf(bytes(blob))
            rows.extend((path, r["doc_id"], r["text"]) for r in records)
        yield pd.DataFrame(rows, columns=["file_path", "doc_id", "text"])


def scan_avro(spark, avro_dir: str) -> DataFrame:
    """OCF containers → one row per record. ``binaryFile`` distributes
    whole files; the block walker + record decoder run in
    ``mapInPandas`` Arrow batches."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(avro_dir)
        .select("path", "content")
    )
    return files.mapInPandas(_walk_batches, schema=AVRO_DOC_SCHEMA)


def stream_scan_avro(spark, avro_dir: str) -> DataFrame:
    """The same decode as a STREAMING source: the file stream watches
    the drop directory (the reference's S3-upload trigger, Spark-
    native), each discovered container decodes in mapInPandas, and
    the checkpoint holds only source-discovery state — landing a new
    .avro file is all a producer has to do."""
    binary_file_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    files = (
        spark.readStream.format("binaryFile")
        .schema(binary_file_schema)
        .option("pathGlobFilter", "*.avro")
        .load(avro_dir)
        .select("path", "content")
    )
    return files.mapInPandas(_walk_batches, schema=AVRO_DOC_SCHEMA)
