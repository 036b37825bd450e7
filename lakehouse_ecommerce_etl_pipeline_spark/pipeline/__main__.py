"""CLI entrypoint — the reference's Glue-job invocation surface as a
module run:

    python -m lakehouse_ecommerce_etl_pipeline_spark.pipeline <base_dir>

Runs the full DAG (marker skip → products → orders → order_items →
validate → archive+mark) over every unprocessed file in
``<base_dir>/raw/`` and prints one JSON summary line, mirroring how
each reference job is an invocable script with a ``main()``
(glue_jobs/orders_etl.py:109)."""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="lakehouse_ecommerce_etl_pipeline_spark.pipeline",
        description="Run the lakehouse ETL DAG over a zone directory.",
    )
    parser.add_argument("base_dir", help="zone root (raw/ processed/ archived/)")
    parser.add_argument(
        "--retries", type=int, default=2, help="attempts per job (default 2)"
    )
    args = parser.parse_args(argv)

    from lakehouse_ecommerce_etl_pipeline_spark.pipeline.driver import run_pipeline
    from lakehouse_ecommerce_etl_pipeline_spark.session import get_spark

    spark = get_spark("pipeline-cli")
    results = run_pipeline(spark, args.base_dir, retry_attempts=args.retries)
    print(json.dumps({"base_dir": args.base_dir, "datasets": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
