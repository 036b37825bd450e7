"""WARC source/writer (sources/warc.py): framing round-trips, the
adversarial payload case (payload bytes that LOOK like a record
boundary — only Content-Length framing survives it), header-order
independence, gzip transparency, and the distributed export→import
identity."""

from __future__ import annotations

import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.sources.warc import (
    WARC_DATE,
    parse_warc,
    scan_warc,
    warc_record_bytes,
    write_warc_files,
)

SF0001 = "/root/testdata/sf0.001"


def test_record_roundtrip_and_adversarial_payload():
    evil = b"hello\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\n"
    rec = warc_record_bytes(
        [("WARC-Type", "response"), ("WARC-Record-ID", "<urn:doc:7>")], evil
    )
    tame = warc_record_bytes(
        [("WARC-Type", "response"), ("WARC-Record-ID", "<urn:doc:8>")], b"ok"
    )
    out = parse_warc(rec + tame)
    assert len(out) == 2
    assert out[0][1] == evil  # the fake boundary did not split the record
    assert out[0][0]["warc-record-id"] == "<urn:doc:7>"
    assert out[1][1] == b"ok"


def test_header_order_independent():
    a = warc_record_bytes(
        [("WARC-Type", "response"), ("WARC-Date", WARC_DATE)], b"x"
    )
    b = warc_record_bytes(
        [("WARC-Date", WARC_DATE), ("WARC-Type", "response")], b"x"
    )
    ha = parse_warc(a)[0][0]
    hb = parse_warc(b)[0][0]
    assert ha == hb


def test_export_import_identity(spark, tmp_path):
    docs = load(spark, SF0001, "documents").select("doc_id", "text")
    out = str(tmp_path / "warc")
    stats = write_warc_files(docs, n_files=4, out_dir=out).collect()
    assert sorted(r["file_id"] for r in stats) == [0, 1, 2, 3]
    # warc_bytes matches the file actually on disk
    for r in stats:
        path = os.path.join(out, f"part_{r['file_id']:05d}.warc")
        assert os.path.getsize(path) == r["warc_bytes"]
    back = (
        scan_warc(spark, out)
        .filter(F.col("warc_type") == "response")
        .select(
            F.regexp_extract("record_id", r"<urn:doc:(\d+)>", 1)
            .cast("long")
            .alias("doc_id"),
            F.col("payload").cast("string").alias("text"),
            "target_uri",
        )
    )
    got = {r["doc_id"]: r for r in back.collect()}
    want = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(got) == set(want)
    for d, r in got.items():
        assert r["text"] == want[d], d
        assert r["target_uri"] == f"http://example.com/doc/{d}"
    # one warcinfo preamble per file
    n_info = scan_warc(spark, out).filter(
        F.col("warc_type") == "warcinfo"
    ).count()
    assert n_info == 4


def test_gzip_transparent(spark, tmp_path):
    docs = (
        load(spark, SF0001, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 50)
    )
    out = str(tmp_path / "warcgz")
    write_warc_files(docs, n_files=2, out_dir=out, compress=True).collect()
    names = sorted(os.listdir(out))
    assert names == ["part_00000.warc.gz", "part_00001.warc.gz"]
    with open(os.path.join(out, names[0]), "rb") as fh:
        assert parse_warc(gzip.decompress(fh.read()))  # well-formed
    back = scan_warc(spark, out).filter(F.col("warc_type") == "response")
    assert back.count() == 50
