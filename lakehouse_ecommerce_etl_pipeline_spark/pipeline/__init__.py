"""The reference's orchestration re-expressed as an in-process Spark
driver: the Step-Functions DAG, Lambda trigger predicate, marker
idempotency, retries and archive steps (SURVEY.md §2.12, §3.1-3.2)
without any AWS services.
"""

from lakehouse_ecommerce_etl_pipeline_spark.pipeline.driver import (  # noqa: F401
    run_dataset,
    run_pipeline,
)
