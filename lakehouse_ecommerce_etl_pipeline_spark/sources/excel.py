"""Distributed multi-sheet workbook ingestion.

reference: glue_jobs/orders_etl.py:41-64 / order_items_etl.py:62-90 —
the reference downloads the whole workbook to the DRIVER, parses it
with pandas sheet-by-sheet, keeps sheets containing the required
columns, drops the rest, and concatenates. Driver-side parse is the
reference's scalability cliff (SURVEY.md §7 hard-part 1).

Spark-first redesign: ``spark.read.format("binaryFile")`` distributes
whole-file bytes to executors; ``mapInPandas`` parses each workbook
where its bytes landed. One task per workbook — horizontal scale-out
across files (the unit of parallelism for ingest batches), with the
reference's exact skip-bad-sheet semantics preserved per sheet.

Workbook formats (pluggable parser, auto-detected from the zip
manifest):

- real ``.xlsx`` via the engine's own stdlib SpreadsheetML reader
  (``sources/xlsx.py`` — zipfile + xml.etree; no openpyxl needed).
- ``fake workbook``: a zip of ``<sheet>.csv`` members — a deterministic
  stand-in kept for fixtures that predate the real reader; identical
  multi-sheet semantics through the same distributed plumbing
  (binaryFile scan, Arrow batching, per-sheet validation, schema
  coercion).

100 TB: per-file tasks mean a 100k-workbook backlog fans out across
the cluster; single giant workbooks remain single-task (xlsx is not
splittable) — the mitigation is upstream file sizing, same as any
non-splittable format (gzip CSV).
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def parse_workbook_bytes(content: bytes) -> dict[str, pd.DataFrame]:
    """bytes → {sheet_name: DataFrame}; auto-detects real xlsx vs the
    CSV-zip fake format."""
    buf = io.BytesIO(content)
    with zipfile.ZipFile(buf) as zf:
        names = zf.namelist()
        if any(n == "[Content_Types].xml" for n in names):  # real xlsx
            # stdlib SpreadsheetML reader (sources/xlsx.py) — no
            # openpyxl needed; covers the subset the reference's
            # pd.ExcelFile parse exercises (orders_etl.py:43-44)
            from lakehouse_ecommerce_etl_pipeline_spark.sources.xlsx import (
                read_xlsx_bytes,
            )

            return read_xlsx_bytes(content)
        out = {}
        for n in sorted(names):
            if n.endswith(".csv"):
                with zf.open(n) as f:
                    out[n[: -len(".csv")]] = pd.read_csv(f)
        return out


def write_fake_workbook(path: str, sheets: dict[str, pd.DataFrame]) -> None:
    """Materialize the CSV-zip fake-workbook format (test fixture)."""
    with zipfile.ZipFile(path, "w") as zf:
        for name, pdf in sheets.items():
            zf.writestr(f"{name}.csv", pdf.to_csv(index=False))


def read_workbooks(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    required_columns: Sequence[str],
) -> DataFrame:
    """Distributed scan of every workbook under ``path``.

    Per sheet: keep it iff it contains every required column
    (reference: orders_etl.py:56-64 — sheets missing columns are
    skipped with a warning, not failed); project to the declared
    schema's columns; coerce types. Output adds ``source_file`` and
    ``sheet_name`` lineage columns.
    """
    out_fields = list(schema.fields) + [
        T.StructField("source_file", T.StringType()),
        T.StructField("sheet_name", T.StringType()),
    ]
    out_schema = T.StructType(out_fields)
    declared = [f.name for f in schema.fields]
    spark_to_pandas = {
        T.IntegerType(): "Int32",
        T.LongType(): "Int64",
        T.DoubleType(): "float64",
        T.BooleanType(): "boolean",
    }

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                sheets = parse_workbook_bytes(row["content"])
                for sheet_name, sheet in sorted(sheets.items()):
                    if not set(required_columns).issubset(sheet.columns):
                        continue  # skip-bad-sheet (orders_etl.py:63-64)
                    cols = {}
                    for f in schema.fields:
                        if f.name in sheet.columns:
                            s = sheet[f.name]
                        else:
                            s = pd.Series([None] * len(sheet))
                        if isinstance(f.dataType, T.TimestampType):
                            s = pd.to_datetime(s, errors="coerce")
                        elif isinstance(f.dataType, T.StringType):
                            s = s.astype("object").where(s.notna(), None)
                            s = s.map(lambda x: None if x is None else str(x))
                        else:
                            pd_type = spark_to_pandas.get(f.dataType)
                            if pd_type:
                                s = pd.to_numeric(s, errors="coerce").astype(pd_type)
                        cols[f.name] = s.reset_index(drop=True)
                    res = pd.DataFrame(cols)
                    res["source_file"] = row["path"]
                    res["sheet_name"] = sheet_name
                    yield res

    bins = spark.read.format("binaryFile").load(path)
    return bins.select("path", "content").mapInPandas(parse, schema=out_schema)
