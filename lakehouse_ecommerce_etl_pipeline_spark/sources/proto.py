"""Protocol-buffers wire format — length-delimited message streams as
export + scan, spec-derived (protobuf encoding docs: varint base-128
little-endian-group encoding, tag = field_number << 3 | wire_type,
wire type 0 = varint, 2 = length-delimited).

Protobuf is the event-bus interchange format the Kafka/gRPC world
streams; the files here use the standard ``writeDelimitedTo`` framing
(varint message length before every message) so a reader can walk a
concatenated stream without an index.  The message is the corpus
document:

    message Doc { int64 doc_id = 1; string text = 2; }

so field tags are the single bytes 0x08 (1<<3|0) and 0x12 (2<<3|2).
Spark's ``from_protobuf`` needs compiled descriptor files and the
spark-protobuf jar (absent from this runtime — probed); the codec
below implements the published wire format directly, the way
sources/avro.py does for OCF and sources/warc.py for ISO 28500.

Oracle strategy (the Avro tier's): the writer is deterministic and
ascending-id ordered, so per-record encoded sizes are CLOSED-FORM
VARINT ARITHMETIC the SQL twin restates digit-exactly; the scan side
proves the full export→import identity against the original table, so
framing bugs (wrong length prefix, tag confusion, split varint) fail
by value, not by crash.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TAG_ID = 0x08    # field 1, varint
_TAG_TEXT = 0x12  # field 2, length-delimited


def write_uvarint(n: int) -> bytes:
    """Base-128 varint of a non-negative int (protobuf uint64 /
    non-negative int64)."""
    if n < 0:
        raise ValueError("uvarint is for non-negative values")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    """(value, next_pos); raises on truncation past the buffer."""
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def encode_doc(doc_id: int, text: str) -> bytes:
    """One Doc message body (no length prefix)."""
    payload = text.encode("utf-8")
    return (
        bytes([_TAG_ID])
        + write_uvarint(doc_id)
        + bytes([_TAG_TEXT])
        + write_uvarint(len(payload))
        + payload
    )


def decode_delimited(blob: bytes) -> Iterator[tuple[int, str]]:
    """Walk a writeDelimitedTo stream of Doc messages."""
    pos = 0
    n = len(blob)
    while pos < n:
        msg_len, pos = read_uvarint(blob, pos)
        end = pos + msg_len
        doc_id, text = None, ""
        while pos < end:
            # Tags are varints (field_number << 3 | wire_type): a field
            # number >= 16 makes the tag multi-byte, so a single-byte
            # read would misparse foreign/schema-evolved streams.  Known
            # tags here are < 0x80, so read_uvarint returns the same
            # value on the fast path.
            tag, pos = read_uvarint(blob, pos)
            if tag == _TAG_ID:
                doc_id, pos = read_uvarint(blob, pos)
            elif tag == _TAG_TEXT:
                ln, pos = read_uvarint(blob, pos)
                text = blob[pos:pos + ln].decode("utf-8")
                pos += ln
            else:  # unknown field: skip per spec (all scalar wire types)
                wt = tag & 0x7
                if wt == 0:
                    _, pos = read_uvarint(blob, pos)
                elif wt == 1:
                    pos += 8
                elif wt == 2:
                    ln, pos = read_uvarint(blob, pos)
                    pos += ln
                elif wt == 5:
                    pos += 4
                else:
                    raise ValueError(f"unsupported wire type {wt}")
        yield doc_id, text


PROTO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.IntegerType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("record_bytes", T.LongType()),
        T.StructField("proto_bytes", T.LongType()),
    ]
)

PROTO_DOC_SCHEMA = T.StructType(
    [
        T.StructField("file_path", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def write_proto_files(
    docs: DataFrame, n_files: int = 8, out_dir: str | None = None
) -> DataFrame:
    """Assign every document to ``doc_id % n_files``, write one
    length-delimited .pb stream per group (ascending id order),
    optionally persist, return per-file stats.  ``record_bytes`` sums
    MESSAGE sizes (tags + varints + payload, excluding the delimiting
    length prefixes) — pure varint arithmetic the SQL oracle restates;
    ``proto_bytes`` is the file size actually produced (prefixes
    included)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        fid = int(pdf["__file"].iloc[0])
        msgs = [
            encode_doc(int(d), str(t))
            for d, t in zip(pdf["doc_id"], pdf["text"])
        ]
        blob = b"".join(write_uvarint(len(m)) + m for m in msgs)
        if out_dir is not None:
            import os

            os.makedirs(out_dir, exist_ok=True)
            tmp = f"{out_dir}/part_{fid:05d}.pb.tmp"
            with open(tmp, "wb") as fh:
                fh.write(blob)
            os.replace(tmp, f"{out_dir}/part_{fid:05d}.pb")
        return pd.DataFrame(
            [(fid, len(msgs), sum(len(m) for m in msgs), len(blob))],
            columns=["file_id", "n_records", "record_bytes", "proto_bytes"],
        )

    assigned = docs.select(
        "doc_id", "text", (F.col("doc_id") % n_files).cast("int").alias("__file")
    )
    return assigned.groupBy("__file").applyInPandas(
        build, schema=PROTO_STATS_SCHEMA
    )


def _walk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for path, blob in zip(pdf["path"], pdf["content"]):
            for doc_id, text in decode_delimited(bytes(blob)):
                rows.append((path, doc_id, text))
        yield pd.DataFrame(rows, columns=["file_path", "doc_id", "text"])


def scan_proto(spark, proto_dir: str) -> DataFrame:
    """Delimited .pb streams → one row per message.  ``binaryFile``
    distributes whole files; the varint walker runs in mapInPandas
    Arrow batches.  At cluster scale hand the walker larger streams or
    frame at block boundaries — protobuf itself is not splittable, so
    file granularity IS the parallelism unit (same caveat as gzip
    text; the export side controls file count/size)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pb")
        .load(proto_dir)
        .select("path", "content")
    )
    return files.mapInPandas(_walk_batches, schema=PROTO_DOC_SCHEMA)


def stream_scan_proto(spark, proto_dir: str) -> DataFrame:
    """The same decode as a STREAMING source: a file stream watches
    the drop directory, each discovered .pb stream decodes through
    the identical varint walker, and the checkpoint holds only
    source-discovery state — landing a new file is all a producer has
    to do (the Kafka-less drop-zone pattern; a real bus would land
    the same wire bytes per record)."""
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
        .option("pathGlobFilter", "*.pb")
        .load(proto_dir)
        .select("path", "content")
    )
    return files.mapInPandas(_walk_batches, schema=PROTO_DOC_SCHEMA)


# ---------------------------------------------------------------- typed
# message Order { int64  o_orderkey     = 1;  // varint
#                 int64  o_custkey      = 2;  // varint
#                 string o_orderstatus  = 3;  // len-delimited
#                 double o_totalprice   = 4;  // fixed64 (wire type 1)
#                 int64  o_orderdate_us = 5;  // varint, epoch micros
#                 string o_orderpriority= 6 } // len-delimited

_OT_K = 0x08   # 1<<3|0
_OT_C = 0x10   # 2<<3|0
_OT_S = 0x1A   # 3<<3|2
_OT_P = 0x21   # 4<<3|1  fixed64
_OT_D = 0x28   # 5<<3|0
_OT_R = 0x32   # 6<<3|2


def encode_order(
    k: int, c: int, status: str, price: float, date_us: int, prio: str
) -> bytes:
    """One Order message body — exercises all three wire types the
    format has for scalars (varint, fixed64, length-delimited); the
    double goes through IEEE-754 little-endian fixed64, bit-exact on
    the round trip."""
    import struct

    sb = status.encode("utf-8")
    rb = prio.encode("utf-8")
    return (
        bytes([_OT_K]) + write_uvarint(k)
        + bytes([_OT_C]) + write_uvarint(c)
        + bytes([_OT_S]) + write_uvarint(len(sb)) + sb
        + bytes([_OT_P]) + struct.pack("<d", price)
        + bytes([_OT_D]) + write_uvarint(date_us)
        + bytes([_OT_R]) + write_uvarint(len(rb)) + rb
    )


def decode_order_delimited(blob: bytes):
    """Walk a delimited stream of Order messages; unknown fields skip
    per spec (all four scalar wire types handled)."""
    import struct

    pos, n = 0, len(blob)
    while pos < n:
        msg_len, pos = read_uvarint(blob, pos)
        end = pos + msg_len
        vals = {"k": None, "c": None, "s": "", "p": None, "d": None, "r": ""}
        while pos < end:
            tag, pos = read_uvarint(blob, pos)  # multi-byte for field >= 16
            if tag == _OT_K:
                vals["k"], pos = read_uvarint(blob, pos)
            elif tag == _OT_C:
                vals["c"], pos = read_uvarint(blob, pos)
            elif tag == _OT_S:
                ln, pos = read_uvarint(blob, pos)
                vals["s"] = blob[pos:pos + ln].decode("utf-8")
                pos += ln
            elif tag == _OT_P:
                vals["p"] = struct.unpack("<d", blob[pos:pos + 8])[0]
                pos += 8
            elif tag == _OT_D:
                vals["d"], pos = read_uvarint(blob, pos)
            elif tag == _OT_R:
                ln, pos = read_uvarint(blob, pos)
                vals["r"] = blob[pos:pos + ln].decode("utf-8")
                pos += ln
            else:
                wt = tag & 0x7
                if wt == 0:
                    _, pos = read_uvarint(blob, pos)
                elif wt == 1:
                    pos += 8
                elif wt == 2:
                    ln, pos = read_uvarint(blob, pos)
                    pos += ln
                elif wt == 5:
                    pos += 4
                else:
                    raise ValueError(f"unsupported wire type {wt}")
        yield (vals["k"], vals["c"], vals["s"], vals["p"], vals["d"], vals["r"])


PROTO_ORDER_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate_us", T.LongType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)


def write_proto_order_files(
    orders: DataFrame, n_files: int = 8, out_dir: str | None = None
) -> DataFrame:
    """Orders → delimited Order-message streams (file = key % n,
    ascending key order).  Same stats contract as write_proto_files."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("o_orderkey")
        fid = int(pdf["__file"].iloc[0])
        msgs = [
            encode_order(int(k), int(c), str(s), float(p), int(d), str(r))
            for k, c, s, p, d, r in zip(
                pdf["o_orderkey"], pdf["o_custkey"], pdf["o_orderstatus"],
                pdf["o_totalprice"], pdf["o_orderdate_us"],
                pdf["o_orderpriority"],
            )
        ]
        blob = b"".join(write_uvarint(len(m)) + m for m in msgs)
        if out_dir is not None:
            import os

            os.makedirs(out_dir, exist_ok=True)
            tmp = f"{out_dir}/orders_{fid:05d}.pb.tmp"
            with open(tmp, "wb") as fh:
                fh.write(blob)
            os.replace(tmp, f"{out_dir}/orders_{fid:05d}.pb")
        return pd.DataFrame(
            [(fid, len(msgs), sum(len(m) for m in msgs), len(blob))],
            columns=["file_id", "n_records", "record_bytes", "proto_bytes"],
        )

    assigned = orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.unix_micros("o_orderdate").alias("o_orderdate_us"),
        "o_orderpriority",
        (F.col("o_orderkey") % n_files).cast("int").alias("__file"),
    )
    return assigned.groupBy("__file").applyInPandas(
        build, schema=PROTO_STATS_SCHEMA
    )


def _walk_order_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in PROTO_ORDER_SCHEMA.fields]
    for pdf in batches:
        rows = []
        for blob in pdf["content"]:
            rows.extend(decode_order_delimited(bytes(blob)))
        yield pd.DataFrame(rows, columns=cols)


def scan_proto_orders(spark, proto_dir: str) -> DataFrame:
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "orders_*.pb")
        .load(proto_dir)
        .select("content")
    )
    return files.mapInPandas(_walk_order_batches, schema=PROTO_ORDER_SCHEMA)


# ------------------------------------------------------------- nested
# message Line       { int64 linenumber = 1;   // varint
#                      int64 partkey    = 2;   // varint
#                      string returnflag = 3 } // len-delimited
# message OrderLines { int64 o_orderkey = 1;          // varint
#                      repeated Line lines = 2;       // embedded msgs
#                      repeated int64 quantities = 3 }// packed varints
#
# Exercises the two repeated encodings real event-bus schemas lean on:
# embedded messages (wire type 2 recursion — each occurrence is one
# length-delimited Line body) and proto3's default PACKED repeated
# scalars (one length-delimited block of back-to-back varints).  The
# walker dispatches on (field_number, wire_type) from a varint tag and
# accepts BOTH packed and expanded encodings for field 3, as the spec
# requires of parsers.

_LN_N = 0x08   # Line.linenumber   1<<3|0
_LN_P = 0x10   # Line.partkey      2<<3|0
_LN_F = 0x1A   # Line.returnflag   3<<3|2


def encode_line(linenumber: int, partkey: int, returnflag: str) -> bytes:
    fb = returnflag.encode("utf-8")
    return (
        bytes([_LN_N]) + write_uvarint(linenumber)
        + bytes([_LN_P]) + write_uvarint(partkey)
        + bytes([_LN_F]) + write_uvarint(len(fb)) + fb
    )


def encode_order_lines(
    orderkey: int,
    lines: list[tuple[int, int, str]],
    quantities: list[int],
) -> bytes:
    """One OrderLines message body: varint key, one embedded Line per
    line, then the quantities as a single packed block."""
    out = bytearray(b"\x08") + write_uvarint(orderkey)
    for n, p, f in lines:
        body = encode_line(n, p, f)
        out += b"\x12" + write_uvarint(len(body)) + body
    if quantities:
        payload = b"".join(write_uvarint(q) for q in quantities)
        out += b"\x1a" + write_uvarint(len(payload)) + payload
    return bytes(out)


def _skip_field(blob: bytes, pos: int, wt: int) -> int:
    if wt == 0:
        _, pos = read_uvarint(blob, pos)
    elif wt == 1:
        pos += 8
    elif wt == 2:
        ln, pos = read_uvarint(blob, pos)
        pos += ln
    elif wt == 5:
        pos += 4
    else:
        raise ValueError(f"unsupported wire type {wt}")
    return pos


def decode_line(body: bytes) -> tuple[int, int, str]:
    pos, end = 0, len(body)
    n, p, f = None, None, ""
    while pos < end:
        tag, pos = read_uvarint(body, pos)
        field, wt = tag >> 3, tag & 0x7
        if field == 1 and wt == 0:
            n, pos = read_uvarint(body, pos)
        elif field == 2 and wt == 0:
            p, pos = read_uvarint(body, pos)
        elif field == 3 and wt == 2:
            ln, pos = read_uvarint(body, pos)
            f = body[pos:pos + ln].decode("utf-8")
            pos += ln
        else:
            pos = _skip_field(body, pos, wt)
    return n, p, f


def decode_order_lines_delimited(
    blob: bytes,
) -> Iterator[tuple[int, list[tuple[int, int, str]], list[int]]]:
    """Walk a delimited OrderLines stream; yields (orderkey, lines,
    quantities).  Repeated fields accumulate across occurrences;
    field 3 accepts packed (wire type 2) AND expanded (wire type 0)
    encodings per spec."""
    pos, n = 0, len(blob)
    while pos < n:
        msg_len, pos = read_uvarint(blob, pos)
        end = pos + msg_len
        key, lines, qtys = None, [], []
        while pos < end:
            tag, pos = read_uvarint(blob, pos)
            field, wt = tag >> 3, tag & 0x7
            if field == 1 and wt == 0:
                key, pos = read_uvarint(blob, pos)
            elif field == 2 and wt == 2:
                ln, pos = read_uvarint(blob, pos)
                lines.append(decode_line(blob[pos:pos + ln]))
                pos += ln
            elif field == 3 and wt == 2:    # packed block
                ln, pos = read_uvarint(blob, pos)
                qend = pos + ln
                while pos < qend:
                    q, pos = read_uvarint(blob, pos)
                    qtys.append(q)
            elif field == 3 and wt == 0:    # expanded occurrence
                q, pos = read_uvarint(blob, pos)
                qtys.append(q)
            else:
                pos = _skip_field(blob, pos, wt)
        yield key, lines, qtys


PROTO_NESTED_SCHEMA = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_linenumber", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_quantity", T.LongType()),
    ]
)


def write_proto_nested_files(
    lineitem: DataFrame, n_files: int = 8, out_dir: str | None = None
) -> DataFrame:
    """lineitem → delimited OrderLines streams: one message per ORDER
    (file = orderkey % n, ascending key order; lines sorted by
    linenumber inside each message, quantities positionally aligned).
    Same stats contract as write_proto_files: n_records counts ORDER
    messages, record_bytes sums message bodies (no length prefixes),
    proto_bytes the framed file size."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(pdf["__file"].iloc[0])
        pdf = pdf.sort_values(["l_orderkey", "l_linenumber"])
        msgs = []
        for key, grp in pdf.groupby("l_orderkey", sort=True):
            lines = [
                (int(n), int(p), str(f))
                for n, p, f in zip(
                    grp["l_linenumber"], grp["l_partkey"], grp["l_returnflag"]
                )
            ]
            qtys = [int(q) for q in grp["l_quantity"]]
            msgs.append(encode_order_lines(int(key), lines, qtys))
        blob = b"".join(write_uvarint(len(m)) + m for m in msgs)
        if out_dir is not None:
            import os

            os.makedirs(out_dir, exist_ok=True)
            tmp = f"{out_dir}/nested_{fid:05d}.pb.tmp"
            with open(tmp, "wb") as fh:
                fh.write(blob)
            os.replace(tmp, f"{out_dir}/nested_{fid:05d}.pb")
        return pd.DataFrame(
            [(fid, len(msgs), sum(len(m) for m in msgs), len(blob))],
            columns=["file_id", "n_records", "record_bytes", "proto_bytes"],
        )

    assigned = lineitem.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        "l_partkey",
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("l_quantity"),
        (F.col("l_orderkey") % n_files).cast("int").alias("__file"),
    )
    return assigned.groupBy("__file").applyInPandas(
        build, schema=PROTO_STATS_SCHEMA
    )


def _walk_nested_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in PROTO_NESTED_SCHEMA.fields]
    for pdf in batches:
        rows = []
        for blob in pdf["content"]:
            for key, lines, qtys in decode_order_lines_delimited(bytes(blob)):
                for (n, p, f), q in zip(lines, qtys):
                    rows.append((key, n, p, f, q))
        yield pd.DataFrame(rows, columns=cols)


def scan_proto_nested(spark, proto_dir: str) -> DataFrame:
    """Delimited OrderLines streams → flattened line rows (the scan
    unnests: one output row per embedded Line, quantity taken from the
    packed array at the same position)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "nested_*.pb")
        .load(proto_dir)
        .select("content")
    )
    return files.mapInPandas(_walk_nested_batches, schema=PROTO_NESTED_SCHEMA)


def stream_scan_proto_nested(spark, proto_dir: str) -> DataFrame:
    """The nested decode as a STREAMING source (the drop-zone pattern
    stream_scan_proto runs for the flat Doc message): a file stream
    watches the nested_*.pb directory and each discovered stream
    flattens through the identical recursive walker — embedded-message
    and packed-repeated decode are batching-invariant because the
    framing is per-file."""
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
        .option("pathGlobFilter", "nested_*.pb")
        .load(proto_dir)
        .select("content")
    )
    return files.mapInPandas(_walk_nested_batches, schema=PROTO_NESTED_SCHEMA)


def decode_delimited_tolerant(blob: bytes) -> tuple[list, bool]:
    """Greedy walk that STOPS at the first incomplete message instead
    of raising — the ingest-recovery contract (a truncated tail file
    yields its complete prefix).  Returns (rows, truncated)."""
    rows, pos, n = [], 0, len(blob)
    while pos < n:
        try:
            msg_len, nxt = read_uvarint(blob, pos)
        except IndexError:
            return rows, True
        if nxt + msg_len > n:
            return rows, True
        framed = write_uvarint(msg_len) + blob[nxt:nxt + msg_len]
        rows.extend(decode_delimited(framed))
        pos = nxt + msg_len
    return rows, False
