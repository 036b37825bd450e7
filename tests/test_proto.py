"""Protobuf wire codec (sources/proto.py): pure-Python round-trip
properties plus the distributed export→scan identity."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypothesis import given, settings
from hypothesis import strategies as st

from lakehouse_ecommerce_etl_pipeline_spark.sources.proto import (
    decode_delimited,
    encode_doc,
    read_uvarint,
    write_proto_files,
    write_uvarint,
    scan_proto,
)

SF0001 = "/root/testdata/sf0.001"


@given(st.integers(min_value=0, max_value=2**63 - 1))
def test_uvarint_roundtrip(n):
    buf = write_uvarint(n)
    val, pos = read_uvarint(buf, 0)
    assert val == n and pos == len(buf)
    # canonical minimal length: ceil(bitlen/7)
    assert len(buf) == max(1, -(-n.bit_length() // 7))


@settings(max_examples=50)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**62),
            st.text(max_size=200),  # includes '', unicode, surrogates-free
        ),
        max_size=20,
    )
)
def test_delimited_stream_roundtrip(rows):
    blob = b"".join(
        write_uvarint(len(m)) + m
        for m in (encode_doc(d, t) for d, t in rows)
    )
    assert list(decode_delimited(blob)) == rows


def test_unknown_field_skipped():
    # a conforming reader skips fields it doesn't know: field 3 varint
    # (tag 0x18) and field 4 length-delimited (tag 0x22)
    m = (
        encode_doc(7, "hi")
        + bytes([0x18]) + write_uvarint(99)
        + bytes([0x22]) + write_uvarint(3) + b"xyz"
    )
    blob = write_uvarint(len(m)) + m
    assert list(decode_delimited(blob)) == [(7, "hi")]


def test_export_scan_identity_distributed(spark, tmp_path):
    docs = spark.read.parquet(f"{SF0001}/documents.parquet").select(
        "doc_id", "text"
    )
    out = str(tmp_path / "pb")
    stats = write_proto_files(docs, n_files=4, out_dir=out).collect()
    assert sorted(s.file_id for s in stats) == [0, 1, 2, 3]
    assert sum(s.n_records for s in stats) == docs.count()
    # proto_bytes = record_bytes + the length prefixes
    for s in stats:
        assert s.proto_bytes > s.record_bytes
    back = scan_proto(spark, out).select("doc_id", "text")
    assert back.count() == docs.count()
    assert back.exceptAll(docs).count() == 0
    assert docs.exceptAll(back).count() == 0


def test_order_message_roundtrip_bits():
    """Typed Order message: doubles round-trip BIT-exactly through
    fixed64, including awkward values (denormals, -0.0, huge)."""
    import math
    import struct

    from lakehouse_ecommerce_etl_pipeline_spark.sources.proto import (
        decode_order_delimited,
        encode_order,
        write_uvarint,
    )

    rows = [
        (0, 0, "", 0.0, 0, ""),
        (1, 2, "O", -0.0, 1_700_000_000_000_000, "1-URGENT"),
        (2**62, 7, "F", 5e-324, 2**55, "5-LOW"),
        (5, 5, "P", 1.7976931348623157e308, 123, "x"),
        (6, 6, "P", float("nan"), 456, "y"),
    ]
    blob = b"".join(
        write_uvarint(len(m)) + m
        for m in (encode_order(*r) for r in rows)
    )
    back = list(decode_order_delimited(blob))
    for want, got in zip(rows, back):
        assert want[:3] == got[:3] and want[4:] == got[4:]
        assert struct.pack("<d", want[3]) == struct.pack("<d", got[3])
        if not math.isnan(want[3]):
            assert want[3] == got[3]


@settings(max_examples=50)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**62),  # orderkey
            st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=10**7),
                    st.integers(min_value=0, max_value=2**50),
                    st.text(max_size=8),
                ),
                max_size=7,
            ),
            st.lists(
                st.integers(min_value=0, max_value=2**40), max_size=7
            ),
        ),
        max_size=10,
    )
)
def test_nested_stream_roundtrip(msgs):
    """OrderLines: embedded-message recursion + packed repeated varints
    round-trip through the delimited stream for arbitrary shapes
    (empty line lists, empty packed blocks, unicode flags)."""
    from lakehouse_ecommerce_etl_pipeline_spark.sources.proto import (
        decode_order_lines_delimited,
        encode_order_lines,
    )

    blob = b"".join(
        write_uvarint(len(m)) + m
        for m in (encode_order_lines(k, ls, qs) for k, ls, qs in msgs)
    )
    assert list(decode_order_lines_delimited(blob)) == [
        (k, ls, qs) for k, ls, qs in msgs
    ]


def test_nested_accepts_expanded_and_multibyte_tags():
    """Spec conformance: repeated int64 field 3 arriving EXPANDED
    (one varint per occurrence, wire type 0) accumulates with packed
    occurrences, and unknown fields with numbers >= 16 (multi-byte
    tags) skip cleanly at both nesting levels."""
    from lakehouse_ecommerce_etl_pipeline_spark.sources.proto import (
        decode_line,
        decode_order_lines_delimited,
        encode_line,
        encode_order_lines,
    )

    base = encode_order_lines(42, [(1, 100, "N")], [5])
    extra = (
        bytes([0x18]) + write_uvarint(9)          # field 3 expanded
        + write_uvarint(16 << 3 | 0) + write_uvarint(77)   # field 16 varint
        + write_uvarint(300 << 3 | 2) + write_uvarint(2) + b"zz"  # field 300
        + write_uvarint(17 << 3 | 1) + b"\x00" * 8          # fixed64
        + write_uvarint(18 << 3 | 5) + b"\x00" * 4          # fixed32
    )
    m = base + extra
    blob = write_uvarint(len(m)) + m
    assert list(decode_order_lines_delimited(blob)) == [
        (42, [(1, 100, "N")], [5, 9])
    ]
    # nested level: unknown multi-byte tag inside a Line body
    lb = (
        encode_line(3, 4, "R")
        + write_uvarint(200 << 3 | 0) + write_uvarint(1)
    )
    assert decode_line(lb) == (3, 4, "R")


def test_nested_export_scan_identity_distributed(spark, tmp_path):
    from lakehouse_ecommerce_etl_pipeline_spark.sources.proto import (
        scan_proto_nested,
        write_proto_nested_files,
    )
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF0001}/lineitem.parquet")
    flat = li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        "l_partkey",
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("l_quantity"),
    )
    out = str(tmp_path / "pb_nested")
    stats = write_proto_nested_files(li, n_files=4, out_dir=out).collect()
    # n_records counts ORDER messages, not line rows
    assert sum(s.n_records for s in stats) == li.select(
        "l_orderkey"
    ).distinct().count()
    back = scan_proto_nested(spark, out)
    assert back.count() == flat.count()
    assert back.exceptAll(flat).count() == 0
    assert flat.exceptAll(back).count() == 0


def test_tolerant_decoder_every_cut_point():
    """Cutting the stream at EVERY byte offset recovers exactly the
    messages wholly before the cut — no exception, no partial rows."""
    from lakehouse_ecommerce_etl_pipeline_spark.sources.proto import (
        decode_delimited_tolerant,
        encode_doc,
        write_uvarint,
    )

    rows = [(i, "x" * i) for i in range(6)]
    msgs = [encode_doc(d, t) for d, t in rows]
    blob = b"".join(write_uvarint(len(m)) + m for m in msgs)
    bounds = []
    off = 0
    for m in msgs:
        off += len(write_uvarint(len(m))) + len(m)
        bounds.append(off)
    for cut in range(len(blob) + 1):
        got, truncated = decode_delimited_tolerant(blob[:cut])
        n_whole = sum(1 for b in bounds if b <= cut)
        assert got == rows[:n_whole], cut
        # exact truncation contract: truncated iff cut is mid-message
        assert truncated == (cut not in (0, *bounds))
