"""Relational operators (SURVEY.md §2).

Thin, composable wrappers over the DataFrame API. Each returns a lazy
DataFrame so Catalyst sees the whole plan (pushdown/pruning/broadcast
all remain available); nothing here collects to the driver.
"""

from lakehouse_ecommerce_etl_pipeline_spark.operators.validate import (  # noqa: F401
    not_null_predicate,
    split_valid_invalid,
)
from lakehouse_ecommerce_etl_pipeline_spark.operators.dedup import (  # noqa: F401
    dedup_arbitrary,
    dedup_deterministic,
)
from lakehouse_ecommerce_etl_pipeline_spark.operators.joins import (  # noqa: F401
    fk_violations,
    referential_filter,
    semi_join,
    anti_join,
)
