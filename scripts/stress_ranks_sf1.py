#!/usr/bin/env python
"""Round-7 scale stress: the boundary-cut rank queries at sf0.1 vs
sf1 (10×), with measured shuffle bytes and spill from the REST API —
the per-query 10× curve VERDICT r6 task 5 asked for (numbers, not
prose).  Writes a markdown table to stdout for
docs/SCALE_STRESS_SF1.md §r7.

Usage: python scripts/stress_ranks_sf1.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_ecommerce_etl_pipeline_spark import plans
from lakehouse_ecommerce_etl_pipeline_spark.session import get_spark

QUERIES = [
    # the eight de-weaked (r6) + the two promoted this round
    "q_histogram_equidepth",
    "q_calibration_deciles",
    "q_quartile_contingency",
    "q_systematic_sample",
    "q_ccnet_quality_buckets",
    "q_rfm_segments",
    "q_shard_assignment_balanced",
    "q_concurrency_sweep",
    "q_abc_classification",
    "q_ks_drift",
    # the rank-stat tier on the same machinery
    "q_spearman_corr",
    "q_theil_sen_trend",
]


def _totals(ui: str) -> dict[str, int]:
    apps = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10)
    )
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{apps[0]['id']}/stages?status=complete",
            timeout=10,
        )
    )
    tot = {"sw": 0, "sr": 0, "spill": 0}
    for st in stages:
        tot["sw"] += st.get("shuffleWriteBytes", 0)
        tot["sr"] += st.get("shuffleReadBytes", 0)
        tot["spill"] += st.get("diskBytesSpilled", 0)
    return tot


def main() -> int:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1"
    os.environ.setdefault("SPARK_GRAFT_UI", "true")
    spark = get_spark("stress_ranks_sf1")
    ui = spark.sparkContext.uiWebUrl
    qs = plans.queries()
    rows = []
    # SPARK_GRAFT_STRESS_QUERIES=a,b,c overrides the default set (the
    # r8 round measured its three changed plans without re-running the
    # full r7 table)
    queries = QUERIES
    override = os.environ.get("SPARK_GRAFT_STRESS_QUERIES")
    if override:
        queries = [q.strip() for q in override.split(",") if q.strip()]
    for name in queries:
        rec = [name]
        for sf_dir in ("/root/testdata/sf0.1", sf1_dir):
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()  # warm (codegen + scratch build)
            before = _totals(ui)
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            secs = time.time() - t0
            d = _totals(ui)
            rec += [
                f"{secs:.1f} s",
                f"{(d['sw'] - before['sw']) / 1e6:.1f} MB",
                f"{(d['spill'] - before['spill']) / 1e6:.0f}",
            ]
        rows.append(rec)
        print("| " + " | ".join(rec) + " |", flush=True)
    print()
    print(
        "| query | sf0.1 | shuffle | spill MB | sf1 | shuffle | spill MB |"
    )
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(r) + " |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
