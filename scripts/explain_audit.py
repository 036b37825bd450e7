#!/usr/bin/env python
"""Plan-quality audit: print condensed physical plans for the headline
queries so regressions in pushdown/broadcast/shuffle shape are visible
at review time.

Usage: python scripts/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_MARKERS = [
    "Scan parquet",
    "PushedFilters",
    "ReadSchema",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "Exchange",
    "HashAggregate",
    "Window",
    "WindowGroupLimit",
    "TakeOrderedAndProject",
    "BroadcastExchange",
]

DEFAULT_QUERIES = [
    "q_scan_parquet",
    "q_groupby_agg",
    "q_star_join",
    "q_join_leftsemi",
    "q_topk",
    "q_dedup_by_key",
    "q_merge_upsert",
    "q_similarity_topk",
    "q_minhash_signatures",
    "q_asof_join",
    "q_incremental_agg_merge",
    "q_gapfill_locf",
    "q_zorder_stats",
    "q_inverted_index",
    "q_pareto_frontier",
    "q_grid_radius_join",
    "q_scd2_history",
    "q_higher_order_fns",
    "q_market_basket",
    "q_association_rules",
    "q_allocation_largest_remainder",
    "q_pointintime_scd2_join",
    "q_attribution_linear",
    "q_percent_of_parent",
    "q_weighted_median",
    "q_oov_rate",
    "q_k_anonymity",
    "q_gdpr_erasure_audit",
    "q_interval_overlap_join",
    "q_containment_pairs",
    "q_partition_pruned_scan",
    "q_schema_merge_scan",
    "q_feature_hashing",
    "q_pmi_collocations",
    "q_temporal_split_leakage_safe",
    "q_late_arriving_dim",
    "q_embedding_near_dup",
    "q_rank_auc",
    "q_hits_scores",
    "q_tvd_drift_weekly",
    "q_gapfill_interpolate",
    "q_dedup_incremental",
    "q_random_projection",
    "q_null_skew_join",
    "q_clustering_coefficient",
    "q_cusum_control",
    "q_tree_rollup",
    "q_interval_union_length",
    "q_nearest_view_join",
    # round-4 additions
    "q_bloom_prefilter_join",
    "q_bm25_topk",
    "q_entity_ids",
    "q_dup_span_removal",
    "q_point_in_polygon",
    "q_char_ioc",
    "q_functional_deps",
    "q_candidate_keys",
    # round-5 additions
    "q_mann_whitney_u",
    "q_rank_centrality",
    "q_gate_agreement_kappa",
    "q_scan_protobuf",
    # round-6: the de-weaked boundary-cut plans (must show NO
    # unpartitioned Window at data grain) + the nested protobuf scan
    "q_histogram_equidepth",
    "q_calibration_deciles",
    "q_quartile_contingency",
    "q_systematic_sample",
    "q_ccnet_quality_buckets",
    "q_rfm_segments",
    "q_shard_assignment_balanced",
    "q_concurrency_sweep",
    "q_scan_protobuf_nested",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT_QUERIES

    from lakehouse_ecommerce_etl_pipeline_spark import plans
    from lakehouse_ecommerce_etl_pipeline_spark.session import get_spark

    spark = get_spark("explain-audit")
    qs = plans.queries()
    for name in names:
        print(f"==== {name}")
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        for line in buf.getvalue().splitlines():
            if any(k in line for k in KEY_MARKERS):
                print(" ", line.strip()[:160])
    return 0


if __name__ == "__main__":
    sys.exit(main())
