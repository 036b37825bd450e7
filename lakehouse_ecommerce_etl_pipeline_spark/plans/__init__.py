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
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics36  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics37  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import spark4  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics38  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics39  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics40  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics41  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics42  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics43  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics44  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics45  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics46  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics47  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics48  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics49  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics50  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm3  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm4  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm5  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm6  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm7  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm8  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm9  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm10  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm11  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm12  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm13  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm14  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm15  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics51  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm16  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import spark4b  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics52  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm17  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm18  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm19  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm20  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics53  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm21  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm22  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm23  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm24  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm25  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm26  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm27  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm28  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm29  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm30  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm31  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm32  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics54  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics55  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics56  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm33  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics57  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm34  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm35  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm36  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics58  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics59  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics60  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics61  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm37  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm38  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import analytics62  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import llm39  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import cdc_q  # noqa: F401,E402
from lakehouse_ecommerce_etl_pipeline_spark.plans import streaming_q  # noqa: F401,E402

# ------------------------------------------------------------------
# The external driver truncates its correctness gate at the first 50
# registry entries in insertion order.  Curation policy (VERDICT r6
# task 1, r7 task 1): a small rotating §2-parity sentinel block (every
# parity row already carries MULTIPLE driver passes from r1–r7) frees
# the remaining slots for rows the driver has never value-checked.
# This round's 46 = the RECORDED r9 queue executed verbatim (SURVEY
# §8, VERDICT r8 task 1): the eleven plan-gate allowlist rows plus the
# promoted q_integer_islands FIRST — so the domain-bounded (or newly
# balanced) windows the registry-wide gate excuses also carry driver
# value proof — then validation/enrichment parity, the UDF/UDAF +
# Python-datasource surface, SQL robustness, scale techniques,
# sketches & robust stats, and LLM text ops.  All 46 were
# pre-certified at sf0.01 by the r8 closing sweep
# (docs/SWEEP_r08_sf0.01.json, 0 fail) and are absent from
# CORRECTNESS_r01–r08; cumulative driver-checked grows 233 → 279
# (target ≥278).  FOUR parity sentinels this round (46 + 4 = 50),
# rotated to rows NOT in the r7 or r8 sentinel blocks.
_FIRST_WINDOW = [
    # --- §2-parity sentinels (4 of the 26, rotating per round; all
    # 26 are driver-green in r1–r8, full list stays registered) ---
    "q_filter_notnull",
    "q_dedup_by_key",
    "q_union_all",
    "q_count_star_sql",
    # --- recorded r9 queue (never driver-checked): the 11 plan-gate
    # allowlist rows + the promoted q_integer_islands ---
    "q_integer_islands",
    "q_mom_growth",
    "q_chi2_independence",
    "q_cumulative_distinct_users",
    "q_benford_first_digit",
    "q_change_point_flags",
    "q_repeat_purchase_curve",
    "q_compaction_plan",
    "q_cusum_control",
    "q_ewma_taps",
    "q_seasonal_decompose",
    "q_backtest_seasonal_naive",
    # --- validation / enrichment parity ---
    "q_rule_validation",
    "q_enrich_derived",
    "q_anomaly_zscore",
    # --- UDF/UDAF + Python-datasource surface ---
    "q_grouped_pandas_norm",
    "q_pandas_udaf_agg",
    "q_pandas_udaf_window",
    "q_python_datasource_stream",
    "q_python_datasource_stream_write",
    "q_sql_udf",
    "q_sql_session_variables",
    # --- SQL-surface robustness ---
    "q_subquery_scalar",
    "q_subquery_exists",
    "q_lateral_topk",
    "q_recursive_month_series",
    "q_try_arithmetic",
    "q_from_csv_parse",
    "q_not_in_nulls",
    "q_nullsafe_join",
    # --- scale techniques ---
    "q_salted_aggregate",
    "q_salted_join",
    "q_bucket_join_no_shuffle",
    "q_partition_pruned_scan",
    "q_null_skew_join",
    "q_hash_partition_profile",
    "q_bloom_prefilter_join",
    # --- sketches & robust stats ---
    "q_countmin_heavy_hitters",
    "q_bitmap_distinct",
    "q_histogram",
    "q_moving_median",
    "q_weighted_median",
    "q_median_mad_outliers",
    # --- LLM text ops ---
    "q_tokenize_explode",
    "q_fingerprint",
    "q_doc_quality_filters",
]


def _curate_window() -> None:
    missing = [n for n in _FIRST_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"window names not registered: {missing}")
    ordered = {name: REGISTRY[name] for name in _FIRST_WINDOW}
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)


_curate_window()
