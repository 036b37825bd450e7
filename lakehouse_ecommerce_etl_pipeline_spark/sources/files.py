"""File scans with explicit schemas.

reference: glue_jobs/product_etl.py:49-52 (CSV with header + declared
StructType — S1), README.md:135 / TESTDATA.md (parquet — S5).

Policy: schemas are DECLARED, never inferred, for production scans
(inference is a full extra pass and nondeterministic under dirty
data). The reference declares products' schema but pandas-infers
orders/order_items (SURVEY.md §1.4 ⚠); here every table gets a
StructType.

100 TB: parquet scans get predicate pushdown + column pruning from
Catalyst automatically (verify via ``PushedFilters``/``ReadSchema`` in
``explain``); CSV is header-split parallel per 128 MiB block. Pass
``paths`` as directories for multi-file parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Declared schemas for the engine's star-schema + extension tables
# (FIXTURES.md §B — verified against /root/testdata parquet footers).
STAR_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
}


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    """reference: product_etl.py:49-52."""
    return (
        spark.read.format("csv")
        .option("header", str(header).lower())
        .schema(schema)
        .load(path)
    )


def read_csv_with_corrupt_capture(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """CSV scan that CAPTURES malformed rows instead of silently
    nulling them (PERMISSIVE + columnNameOfCorruptRecord) — rows whose
    raw text couldn't parse land with the raw line in ``corrupt_col``
    and NULLs elsewhere, ready for the quarantine sink. The honest
    version of the reference's dirty-data story (its CSV scan drops
    malformed values silently)."""
    full_schema = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    return (
        spark.read.format("csv")
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(full_schema)
        .load(path)
    )


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the testdata star-schema tables (TESTDATA.md)."""
    return spark.read.parquet(table_path(sf_dir, name))
