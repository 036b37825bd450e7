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
# This round's 45 = the RECORDED r8 queue executed verbatim (SURVEY
# §8: formats & schema-on-read, Spark-4 surface, streaming,
# window/function batteries, governance, graph, LLM curation, retail
# analytics — all 42 pre-certified at sf0.01 in r7) + the two plans
# promoted onto the boundary-cut machinery THIS round
# (q_decision_stump, q_surrogate_keys — VERDICT r7 tasks 3–4 ask for
# their driver rows) + q_setsim_prefix_join (vocab rank de-risked
# THIS round, task 5).  All 45 are absent from CORRECTNESS_r01–r07;
# cumulative driver-checked grows 188 → 233 (target ≥226).  The five
# parity sentinels rotate to rows NOT in the r7 sentinel block.
_FIRST_WINDOW = [
    # --- §2-parity sentinels (5 of the 26, rotating per round; all
    # 26 are driver-green in r1–r7, full list stays registered) ---
    "q_scan_parquet",
    "q_project",
    "q_filter_null_complement",
    "q_join_leftanti",
    "q_write_partitioned",
    # --- recorded r8 queue (never driver-checked): formats &
    # schema-on-read ---
    "q_scan_orc",
    "q_scan_json",
    "q_scan_fixed_width",
    "q_csv_corrupt_recovery",
    "q_json_corrupt_recovery",
    "q_export_protobuf_orders",
    "q_scan_protobuf_orders",
    "q_protobuf_corrupt_recovery",
    # --- Spark-4 surface ---
    "q_udtf_dynamic_schema",
    "q_map_in_arrow_derive",
    "q_grouped_arrow_stats",
    "q_python_datasource_write",
    "q_sql_pipe_syntax",
    "q_sql_scripting",
    # --- streaming ---
    "q_stream_sliding_agg",
    "q_stream_static_join",
    "q_stream_interval_join",
    "q_windowed_dedup",
    "q_batch_session_window",
    # --- window/function batteries ---
    "q_window_rank_fns",
    "q_window_time_range",
    "q_having",
    "q_grouping_id",
    "q_string_fns",
    "q_date_fns",
    "q_math_fns",
    # --- governance ---
    "q_k_anonymity",
    "q_gdpr_erasure_audit",
    "q_pii_detect",
    # --- graph ---
    "q_triangle_count",
    "q_hits_scores",
    "q_bfs_distances",
    "q_clustering_coefficient",
    # --- LLM curation ---
    "q_contamination_ngrams",
    "q_repetition_score",
    "q_split_train_val",
    "q_vocab_topn",
    "q_chunk_documents",
    "q_dup_span_histogram",
    # --- retail analytics ---
    "q_return_rate_monthly",
    "q_shipping_sla",
    "q_supplier_hhi",
    # --- this round's promotions / de-risk (VERDICT r7 tasks 3-5:
    # production plans changed, driver rows requested) ---
    "q_decision_stump",
    "q_surrogate_keys",
    "q_setsim_prefix_join",
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
