"""WARC (ISO 28500) source + writer — the format web-scale corpora
actually arrive in (Common Crawl ships WARC; every WET/WAT derivative
starts from it).

The reference ingests CSV/Excel drops (SURVEY §2.1); a training-data
pipeline's raw zone is crawl archives, so this extends the source tier
the same way llm/export.py extended the sink tier with tar shards:

- writer: deterministic WARC/1.0 files (fixed WARC-Date, urn:doc ids,
  CRLF framing per the spec: version line, named headers, blank line,
  payload, double CRLF) — one ``applyInPandas`` group per output file;
  byte-exact accounting returned per file. Determinism makes
  re-exports idempotent and the byte math closed-form, which is what
  lets the driver value-oracle a BINARY FORMAT writer in ANSI SQL.
- source: ``binaryFile`` distributes whole archives (one task per
  file — WARC members are sequential, the file is the parallelism
  unit, exactly like tar), and a ``mapInPandas`` walker parses
  records: version line, header block split on CRLFCRLF,
  Content-Length-driven payload read (the ONLY correct framing — a
  payload may contain anything, including things that look like
  record boundaries), header-order independent. ``.warc.gz`` files
  are transparently inflated (stdlib zlib).

100 TB: archives scan in parallel across files; record payloads land
in a binary column pruned until touched (same contract as the
multimodal tables). Parsing cost is linear in bytes; nothing shuffles
until the caller aggregates.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CRLF = b"\r\n"
VERSION = b"WARC/1.0"
WARC_DATE = "2026-01-01T00:00:00Z"  # pinned: determinism ⇒ oracle-able
WARCINFO_PAYLOAD = b"software: lakehouse-ecommerce-etl-pipeline-spark\r\n"


def warc_record_bytes(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    """One WARC record: version line, headers (given order),
    Content-Length computed from the payload, blank line, payload,
    double CRLF terminator."""
    buf = io.BytesIO()
    buf.write(VERSION + CRLF)
    for name, value in headers:
        buf.write(f"{name}: {value}".encode("utf-8") + CRLF)
    buf.write(f"Content-Length: {len(payload)}".encode() + CRLF)
    buf.write(CRLF)
    buf.write(payload)
    buf.write(CRLF + CRLF)
    return buf.getvalue()


def _doc_record(doc_id: int, text: str) -> bytes:
    return warc_record_bytes(
        [
            ("WARC-Type", "response"),
            ("WARC-Record-ID", f"<urn:doc:{doc_id}>"),
            ("WARC-Date", WARC_DATE),
            ("WARC-Target-URI", f"http://example.com/doc/{doc_id}"),
            ("Content-Type", "text/plain"),
        ],
        text.encode("utf-8"),
    )


def _warcinfo_record(file_id: int) -> bytes:
    return warc_record_bytes(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID", f"<urn:warcinfo:{file_id}>"),
            ("WARC-Date", WARC_DATE),
            ("Content-Type", "application/warc-fields"),
        ],
        WARCINFO_PAYLOAD,
    )


WARC_STATS_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.IntegerType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("warc_bytes", T.LongType()),
    ]
)


def write_warc_files(
    docs: DataFrame,
    n_files: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_dir: str | None = None,
    compress: bool = False,
) -> DataFrame:
    """Assign every document to ``id % n_files``, write one WARC per
    group (leading warcinfo record, then doc responses in ascending id
    order), optionally persist, return per-file stats. ``warc_bytes``
    is measured from the bytes actually produced (uncompressed form —
    the quantity the closed-form oracle can state)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        fid = int(pdf["__file"].iloc[0])
        blob = _warcinfo_record(fid) + b"".join(
            _doc_record(int(d), str(t))
            for d, t in zip(pdf[id_col], pdf[text_col])
        )
        if out_dir is not None:
            import os

            os.makedirs(out_dir, exist_ok=True)
            name = f"part_{fid:05d}.warc" + (".gz" if compress else "")
            data = (
                gzip.compress(blob, mtime=0) if compress else blob
            )
            tmp = f"{out_dir}/{name}.tmp"
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.replace(tmp, f"{out_dir}/{name}")
        return pd.DataFrame(
            [
                (
                    fid,
                    len(pdf),
                    sum(len(str(t).encode()) for t in pdf[text_col]),
                    len(blob),
                )
            ],
            columns=["file_id", "n_records", "payload_bytes", "warc_bytes"],
        )

    assigned = docs.select(
        F.col(id_col), F.col(text_col),
        (F.col(id_col) % n_files).cast("int").alias("__file"),
    )
    return assigned.groupBy("__file").applyInPandas(
        build, schema=WARC_STATS_SCHEMA
    )


def parse_warc(blob: bytes) -> list[tuple[dict[str, str], bytes]]:
    """Walk a WARC byte stream → [(headers, payload)]. Framing is
    Content-Length-driven (the spec's only correct strategy); header
    names are case-insensitively normalized; record order preserved."""
    out = []
    pos = 0
    n = len(blob)
    while pos < n:
        # tolerate inter-record padding/newlines
        while pos < n and blob[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = blob.index(CRLF + CRLF, pos)
        head = blob[pos:head_end].decode("utf-8")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line at {pos}: {lines[0]!r}")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            name, _, value = line.partition(":")
            headers[name.strip().lower()] = value.strip()
        length = int(headers["content-length"])
        body_start = head_end + 4
        out.append((headers, blob[body_start : body_start + length]))
        pos = body_start + length + 4  # payload + CRLF CRLF
    return out


WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("file_path", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def scan_warc(spark, warc_dir: str) -> DataFrame:
    """WARC archives → one row per record. ``binaryFile`` distributes
    whole files (the parallelism unit; members are sequential), the
    walker runs in ``mapInPandas`` Arrow batches; ``.warc.gz`` inflates
    transparently."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                raw = bytes(blob)
                if path.endswith(".gz"):
                    raw = gzip.decompress(raw)
                for headers, payload in parse_warc(raw):
                    rows.append(
                        (
                            path,
                            headers.get("warc-type"),
                            headers.get("warc-record-id"),
                            headers.get("warc-target-uri"),
                            headers.get("content-type"),
                            payload,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_path",
                    "warc_type",
                    "record_id",
                    "target_uri",
                    "content_type",
                    "payload",
                ],
            )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(warc_dir)
        .select("path", "content")
    )
    return files.mapInPandas(walk, schema=WARC_RECORD_SCHEMA)
