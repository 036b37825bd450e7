"""Avro OCF codec (sources/avro.py): spec-vector parity, round trips
through both codecs, framing adversaries, and the Spark write→scan
identity."""

from __future__ import annotations

import pytest

from lakehouse_ecommerce_etl_pipeline_spark.sources.avro import (
    parse_ocf,
    scan_avro,
    sync_marker,
    unzigzag,
    write_avro_files,
    write_long,
    write_ocf,
    zigzag,
)

FIELDS = [
    ("id", "long"),
    ("name", "string"),
    ("score", ["null", "double"]),
    ("ok", "boolean"),
    ("blob", "bytes"),
]
ROWS = [
    (1, "alpha", 1.5, True, b"\x00\xff"),
    (-7, "", None, False, b""),
    # payload deliberately CONTAINS the file's own sync marker — the
    # byte-size framing must not be fooled
    (2**40, "unicode é中", 2.25, True, bytes(sync_marker(3))),
]


def test_zigzag_varint_spec_vectors():
    # avro spec 1.11 "binary encoding" examples
    assert [zigzag(n) for n in (0, -1, 1, -2, 2)] == [0, 1, 2, 3, 4]
    assert [unzigzag(u) for u in (0, 1, 2, 3, 4)] == [0, -1, 1, -2, 2]
    assert write_long(0) == b"\x00"
    assert write_long(-1) == b"\x01"
    assert write_long(1) == b"\x02"
    assert write_long(64) == b"\x80\x01"
    assert write_long(-64) == b"\x7f"


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_round_trip(codec):
    blob = write_ocf(ROWS, FIELDS, file_id=3, codec=codec, records_per_block=2)
    records, fields = parse_ocf(blob)
    assert fields == FIELDS
    got = [tuple(r[n] for n, _ in FIELDS) for r in records]
    assert got == ROWS


def test_ocf_rejects_corruption():
    blob = bytearray(write_ocf(ROWS, FIELDS, file_id=1))
    blob[-1] ^= 0xFF  # flip a byte inside the trailing sync marker
    with pytest.raises(ValueError, match="sync marker"):
        parse_ocf(bytes(blob))
    with pytest.raises(ValueError, match="not an Avro"):
        parse_ocf(b"PAR1" + bytes(blob))


def test_writer_is_deterministic():
    a = write_ocf(ROWS, FIELDS, file_id=5, codec="deflate")
    b = write_ocf(ROWS, FIELDS, file_id=5, codec="deflate")
    assert a == b
    assert a != write_ocf(ROWS, FIELDS, file_id=6, codec="deflate")


def test_spark_write_scan_identity(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"doc {i} body {'x' * (i % 17)}") for i in range(100)],
        "doc_id long, text string",
    )
    out = str(tmp_path / "avro")
    stats = write_avro_files(docs, n_files=4, out_dir=out, codec="deflate")
    srows = {r["file_id"]: r for r in stats.collect()}
    assert sum(r["n_records"] for r in srows.values()) == 100
    back = scan_avro(spark, out)
    assert sorted(
        (r["doc_id"], r["text"]) for r in back.collect()
    ) == sorted((i, f"doc {i} body {'x' * (i % 17)}") for i in range(100))
