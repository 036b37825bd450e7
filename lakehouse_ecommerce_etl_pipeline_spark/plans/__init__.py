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
# parity row already carries MULTIPLE driver passes from r1–r10) frees
# the remaining slots for rows the driver has never value-checked.
# This round's window = the RECORDED r12 closing window executed
# verbatim (SURVEY §8 r11 item 5, VERDICT r11 task 1): the 48
# remaining never-driver-checked registry rows (38 oracled + 10
# rows-only), all pre-certified at sf0.01 by the r11 closing sweep
# (docs/SWEEP_r11_sf0.01.json, 0 fail) and absent from
# CORRECTNESS_r01–r11, PLUS two parity sentinels rotated to rows NOT
# in the r8–r11 sentinel blocks (q_count, q_fn_to_date — last
# driver-checked r6).  2 + 48 = 50; cumulative driver-checked closes
# 372 → **420/420**.
_FIRST_WINDOW = [
    # --- §2-parity sentinels (2 of the 26, rotating per round; all
    # 26 are driver-green in r1–r11, full list stays registered) ---
    "q_count",
    "q_fn_to_date",
    # --- recorded r12 closing queue: the 38 remaining oracled rows ---
    "q_incremental_agg_merge",
    "q_zorder_stats",
    "q_pareto_frontier",
    "q_grid_radius_join",
    "q_event_transitions",
    "q_sequence_pattern",
    "q_quintile_transition",
    "q_dq_expectations",
    "q_pointintime_scd2_join",
    "q_association_rules",
    "q_allocation_largest_remainder",
    "q_percent_of_parent",
    "q_log2_histogram",
    "q_checksum_table",
    "q_normalize_embeddings",
    "q_duplicate_payments",
    "q_above_p90_customers",
    "q_price_dispersion",
    "q_discount_depth",
    "q_interval_overlap_join",
    "q_late_arriving_dim",
    "q_rank_auc",
    "q_gini_impurity",
    "q_array_setops",
    "q_negative_sampling",
    "q_hard_negatives",
    "q_stream_interval_join_outer",
    "q_dup_rate_by_source",
    "q_stream_incremental_dedup",
    "q_random_projection",
    "q_dataset_card",
    "q_simhash_md5",
    "q_dedup_minby",
    "q_logreg_score",
    "q_split_by_cluster_leakage_safe",
    "q_cdc_join_maintenance",
    "q_profile_table",
    "q_stream_transform_with_state",
    # --- the 10 rows-only rows (driver certifies row count + schema;
    # values are engine-specific — each carries an exact-parity pytest,
    # see SURVEY §8 r11 item 5's certification table) ---
    "q_simhash",
    "q_ann_ivf",
    "q_kmeans_clusters",
    "q_bpe_train_merges",
    "q_bpe_encode_corpus",
    "q_pq_encode",
    "q_pq_adc_topk",
    "q_ivfpq_topk",
    "q_ann_recall",
    "q_logreg_train",
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

# ------------------------------------------------------------------
# RECORDED r13 re-certification window (SURVEY §8 r12 record, VERDICT
# r11 task 2) — apply at the START of round 13 by replacing
# _FIRST_WINDOW above.  Coverage closed at 420/420 in r12, so r13+
# windows re-certify the ~73 integer-lattice-converted rows whose
# driver passes predate the r11 sweep (docs/RECERT_LEDGER_r11.txt;
# 13 were re-certified inside the r11 window, 5 inside the r12
# window → 55 remain, plus q_winsorized_mean re-touched in r12 by the
# disjoint-tails ADVICE fix = 56).  r13 = 2 rotating parity sentinels
# NOT in the r9–r12 sentinel blocks (pick from q_scan_csv /
# q_merge_upsert / q_rejected_records / q_join_leftsemi, last checked
# r7) + these 48 rows, priority per VERDICT r11 task 2 —
# 15 TPC-H: q_tpch_q3_shipping_priority q_tpch_q5_local_supplier
# q_tpch_q6_forecast_revenue q_tpch_q7_nation_volume
# q_tpch_q8_market_share q_tpch_q9_product_profit
# q_tpch_q10_returned_items q_tpch_q11_important_value_share
# q_tpch_q14_promo_share q_tpch_q15_top_supplier
# q_tpch_q17_small_quantity_revenue q_tpch_q18_large_volume
# q_tpch_q19_brand_revenue q_tpch_q20_heavy_shippers
# q_tpch_q22_idle_customers
# 5 streaming: q_stream_tumbling_agg q_stream_sliding_agg
# q_stream_session_window q_stream_static_join q_batch_session_window
# 7 bench/§2-visible: q_groupby_agg q_star_join q_cube q_window_frame
# q_events_window_agg q_enrich_derived q_winsorized_mean
# 21 remainder (alphabetical): q_abc_classification q_anomaly_zscore
# q_backtest_seasonal_naive q_change_point_flags q_chi2_independence
# q_csv_corrupt_recovery q_cusum_control q_ewma_taps q_file_provenance
# q_grouping_sets q_json_corrupt_recovery q_mann_kendall_s
# q_mom_growth q_nested_field_pruning q_pandas_udaf_agg
# q_pandas_udaf_window q_recursive_month_series q_rfm_segments
# q_rollup q_salted_aggregate q_seasonal_decompose
# 2 + 48 = 50.  r14 takes the ledger's final 8 (q_sliding_window_agg
# q_sql_pipe_syntax q_sql_session_variables q_sql_udf
# q_subquery_scalar q_supplier_hhi q_theil_sen_trend
# q_window_time_range) closing the re-certification ledger, + 40
# oldest-certification refresh rows (latest pass r1–r4; exact list in
# SURVEY §8 r12 record).
