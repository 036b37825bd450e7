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
# task 1): the fixed §2-parity block SHRINKS to ~10 rotating
# sentinels (every parity row already carries MULTIPLE driver passes
# from r1–r6), freeing 40 slots per round for rows the driver has
# never value-checked.  This round's 40 = the recorded r7 queue
# (SURVEY §8: the de-weaked five whose production plans changed in
# r6, the streaming batch twins, packing/sharding/mixture, the
# nested-protobuf trio, the round-6 rank-stat/ROUGE tiers) + 18 more
# never-checked rows spanning CDC, UDF/UDTF surface, governance,
# Avro, behavior analytics, sketches, and graph ops + 2 stale-pass
# re-certifications (q_embedding_clusters — rep-collapse landed after
# its r3 pass; q_ks_drift — promoted onto the prefix-sum primitive
# THIS round).  38 of the 40 are absent from CORRECTNESS_r01–r06
# (target ≥35); cumulative driver-checked grows 150 → 188.
_FIRST_WINDOW = [
    # --- §2-parity sentinels (10 of the 26, rotating per round; all
    # 26 are driver-green in r1–r6, full list stays registered) ---
    "q_scan_csv",
    "q_scan_excel",
    "q_scan_delta",
    "q_merge_upsert",
    "q_rejected_records",
    "q_filter_notnull",
    "q_join_leftsemi",
    "q_dedup_by_key",
    "q_union_all",
    "q_count_star_sql",
    # --- re-certification: production plans changed after their last
    # driver pass (r3 / r4) ---
    "q_embedding_clusters",
    "q_ks_drift",
    # --- recorded r7 queue (never driver-checked) ---
    "q_stream_tumbling_agg",
    "q_stream_stateful_totals",
    "q_stream_session_window",
    "q_pack_sequences",
    "q_shard_assignment_balanced",
    "q_token_budget_mixture",
    "q_export_protobuf_nested",
    "q_scan_protobuf_nested",
    "q_stream_protobuf_nested_ingest",
    "q_histogram_equidepth",
    "q_calibration_deciles",
    "q_quartile_contingency",
    "q_systematic_sample",
    "q_ccnet_quality_buckets",
    "q_rfm_segments",
    "q_concurrency_sweep",
    "q_spearman_corr",
    "q_theil_sen_trend",
    "q_mann_kendall_s",
    "q_rouge2_pairs",
    # --- breadth fill (never driver-checked): CDC + incremental
    # maintenance, stateful/UDF/UDTF/datasource surface, governance,
    # Avro export, behavior analytics, sketch + graph ops, and the
    # ABC promotion from THIS round ---
    "q_abc_classification",
    "q_cdc_agg_maintenance",
    "q_merge_apply_changes",
    "q_table_changes",
    "q_capped_running_balance",
    "q_pandas_udf_tokens",
    "q_udtf_bigrams",
    "q_variant_extract",
    "q_python_datasource",
    "q_mask_pii",
    "q_pseudonymize_keys",
    "q_export_avro",
    "q_cohort_retention",
    "q_market_basket",
    "q_funnel_ordered",
    "q_hll_mergeable",
    "q_connected_components",
    "q_topk_per_group",
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
