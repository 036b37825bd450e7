"""Partitioned table writes.

reference: glue_jobs/orders_etl.py:93-96 (initial write partitioned by
``date``), product_etl.py:83-86 (by ``department``),
order_items_etl.py:120-123 (by ``date``).

100 TB notes: partition by a low-cardinality column the queries filter
on (date). ``maxRecordsPerFile`` caps file size; AQE coalescing avoids
the small-file problem on the other end. For join-heavy tables add
bucketing (``bucketBy``) on the join key so downstream joins co-locate
without a shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
    max_records_per_file: int = 5_000_000,
) -> None:
    (
        df.write.format(fmt)
        .mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .save(path)
    )
