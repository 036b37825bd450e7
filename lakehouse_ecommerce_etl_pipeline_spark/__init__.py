"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference lakehouse e-commerce ETL pipeline
(Eugenia-DE/lakehouse-ecommerce-etl-pipeline), rebuilt Spark-first.

Layout
------
- ``session``    : SparkSession factory (AQE, Arrow, UTC, Delta-gated).
- ``sources``    : scans — CSV/parquet/JSON, distributed Excel
                   (binaryFile + mapInPandas), managed lakehouse tables.
- ``sinks``      : partitioned writes, MERGE upsert, quarantine,
                   processed-file marker log, catalog DDL.
- ``operators``  : relational operators (validate, dedup, joins,
                   set ops, aggregates, windows, sort/top-k).
- ``functions``  : scalar function helpers (datetime, strings, JSON,
                   arrays/vectors, text analysis).
- ``llm``        : large-scale training-data pipeline operators
                   (exact/MinHash/SimHash dedup, similarity search,
                   multimodal column plumbing).
- ``pipeline``   : the reference's Step-Functions DAG re-expressed as
                   an in-process Spark driver (markers, retries,
                   ordering, archive).
- ``streaming``  : Structured Streaming variants (file source,
                   watermark + windows, foreachBatch merge).
- ``plans``      : the registered query corpus consumed by
                   ``__spark_entry__.py`` (Spark callable + DuckDB
                   oracle SQL per operator).

Every public function's docstring cites the reference behavior it
reproduces as ``reference: file:line`` so parity can be audited.
"""

__version__ = "0.1.0"

from lakehouse_ecommerce_etl_pipeline_spark.session import get_spark  # noqa: F401
