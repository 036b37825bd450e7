"""The registered query corpus (driver contract).

Importing this package populates the registry: every operator from
SURVEY.md §2 (and the extension tiers) registers a named Spark
callable plus — when SQL-expressible — a DuckDB oracle string.
``__spark_entry__.py`` re-exports ``queries()`` / ``oracle_sql()``.
"""

from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import (  # noqa: F401
    oracle_sql,
    queries,
    REGISTRY,
)

# populate the registry (import order = SURVEY.md tier order)
from lakehouse_ecommerce_etl_pipeline_spark.plans import parity  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import lakehouse  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics2  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm2  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import sources_q  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import rules_q  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics3  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import tpch  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import tpch2  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import tpch3  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import tpch4  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics4  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics5  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics6  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics7  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics8  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics9  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics10  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics11  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics12  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import scd  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics13  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics14  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics15  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics16  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics17  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics18  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics19  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics20  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics21  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics22  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics23  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics24  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics25  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics26  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics27  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics28  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics29  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics30  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics31  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics32  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics33  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics34  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics35  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm3  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm4  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm5  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm6  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm7  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm8  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm9  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm10  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import cdc_q  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import streaming_q  # noqa: F401,E402
