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
# registry entries in insertion order.  Curation policy (VERDICT r2
# "rotate the window"): the ~26 SURVEY §2 reference-parity rows stay
# FIXED every round; the remaining ~24 slots ROTATE each round to
# queries the driver has never value-checked, so the hard per-value
# signal accumulates across the registry over rounds instead of
# re-proving the same extension rows.  Cumulative driver-checked
# set after r5: 126 distinct queries (CORRECTNESS_r01–r05, all
# green); the round-6 block below adds 24 more.
_FIRST_WINDOW = [
    # --- fixed §2 parity rows (driver-green r1+r2, keep forever) ---
    "q_scan_csv",
    "q_scan_parquet",
    "q_project",
    "q_filter_notnull",
    "q_filter_null_complement",
    "q_filter_string_predicate",
    "q_dedup_by_key",
    "q_distinct",
    "q_count",
    "q_count_star_sql",
    "q_join_leftsemi",
    "q_join_leftanti",
    "q_except",
    "q_union_all",
    "q_intersect",
    "q_fn_cast_timestamp",
    "q_fn_to_date",
    "q_fn_string_split",
    "q_fn_current_timestamp",
    "q_rejected_records",
    "q_scan_table",
    "q_scan_delta",
    "q_merge_upsert",
    "q_merge_upsert_storage",
    "q_write_partitioned",
    "q_scan_excel",
    # --- round-6 rotation: never driver-checked before (the recorded
    # r5 queue, VERDICT r5 item 1).  Targets, priority order: the
    # TPC-H tail — the largest never-checked block and the one a real
    # analyst hits first (16 queries: q2/q4/q7/q8/q10-q20/q22; q21 and
    # q1/q3/q5/q6/q9 were driver-green in r1-r4), the round-5 tiers
    # (pairwise-preference statistics + the protobuf wire-format trio),
    # and the SCD2 pair.  The streaming batch-twins and
    # q_pack_sequences/q_token_budget_mixture stay at the head of the
    # round-7 queue (SURVEY §8) — 24 slots is the cap.  Rows rotated
    # OUT were driver-green in r1-r5 (CORRECTNESS_r0{1..5});
    # everything stays registered and full-swept locally
    # (scripts/check_oracle.py --json -> docs/SWEEP_r06.json).
    "q_tpch_q2_min_acctbal_supplier",
    "q_tpch_q4_order_priority",
    "q_tpch_q7_nation_volume",
    "q_tpch_q8_market_share",
    "q_tpch_q10_returned_items",
    "q_tpch_q11_important_value_share",
    "q_tpch_q12_late_lines",
    "q_tpch_q13_customer_distribution",
    "q_tpch_q14_promo_share",
    "q_tpch_q15_top_supplier",
    "q_tpch_q16_supplier_count",
    "q_tpch_q17_small_quantity_revenue",
    "q_tpch_q18_large_volume",
    "q_tpch_q19_brand_revenue",
    "q_tpch_q20_heavy_shippers",
    "q_tpch_q22_idle_customers",
    "q_mann_whitney_u",
    "q_rank_centrality",
    "q_gate_agreement_kappa",
    "q_export_protobuf",
    "q_scan_protobuf",
    "q_stream_protobuf_ingest",
    "q_scd2_history",
    "q_scd2_incremental_apply",
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
