#!/usr/bin/env python
"""Scale-stress the MinHash→LSH→verify dedup chain at the PRODUCTION
recall layout (64 permutations, 16 bands × 4 rows) — VERDICT r3
task #5: the sf1 OLAP stress never exercised the 100 TB flagship.

Per corpus (sf0.1 and a 10× scaled copy) this measures, stage by
stage:

- signature build time (64 universal-hash perms, zero shuffles);
- the BUCKET PROFILE of the banded index: max bucket, p99 bucket,
  buckets above the production cap, band rows dropped by the cap,
  and the *pair explosion guard* — candidate pairs implied by the
  uncapped profile (Σ k·(k−1)/2) vs pairs actually materialized
  after the cap;
- capped candidate generation time + count;
- exact-Jaccard verification time + verified pair count;
- cumulative shuffle/spill bytes from the UI REST API (the spill
  row must stay zero — the chain's exchanges carry only 16-byte
  hashes and ids, never text).

Usage: python scripts/dedup_scale_stress.py [sf_dir ...]
       (defaults: /root/testdata/sf0.1 /tmp/testdata_sf1)

Requires SPARK_GRAFT_UI=1 for the REST rows (else they print n/a).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.llm.dedup import (
    jaccard_pairs,
    lsh_band,
    lsh_candidate_pairs,
    minhash_signatures_universal,
)
from lakehouse_ecommerce_etl_pipeline_spark.session import get_spark

NUM_HASHES = 64
ROWS_PER_BAND = 4  # 16 bands — the production recall layout
MAX_BUCKET = 20
JACCARD_THRESH = 0.5


def _rest_totals(spark) -> dict | None:
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return None
    try:
        apps = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10)
        )
        stages = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{apps[0]['id']}/stages"
                "?status=complete",
                timeout=10,
            )
        )
    except Exception:  # noqa: BLE001 — REST is optional
        return None
    tot = {"shuffle_read": 0, "shuffle_write": 0, "spill_disk": 0}
    for st in stages:
        tot["shuffle_read"] += st.get("shuffleReadBytes", 0)
        tot["shuffle_write"] += st.get("shuffleWriteBytes", 0)
        tot["spill_disk"] += st.get("diskBytesSpilled", 0)
    return tot


def _mb(n: int) -> str:
    return f"{n / (1 << 20):.1f}MB"


def stress(spark, sf_dir: str) -> dict:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    out: dict = {"sf_dir": sf_dir, "n_docs": n_docs}

    t0 = time.perf_counter()
    sigs = minhash_signatures_universal(
        docs, "doc_id", "text", NUM_HASHES
    ).persist()
    sigs.count()
    out["t_signatures"] = round(time.perf_counter() - t0, 2)

    # bucket profile of the banded index (the quantity that decides
    # whether the self-join explodes): per (band_idx, band_hash)
    # bucket size k, uncapped pair mass Σ k(k-1)/2
    t0 = time.perf_counter()
    banded = lsh_band(sigs, "doc_id", NUM_HASHES, ROWS_PER_BAND)
    prof = (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("k").alias("max_bucket"),
            F.expr("percentile_approx(k, 0.99)").alias("p99_bucket"),
            F.sum(F.expr(f"CASE WHEN k > {MAX_BUCKET} THEN 1 ELSE 0 END")).alias(
                "buckets_over_cap"
            ),
            F.sum(
                F.expr(f"CASE WHEN k > {MAX_BUCKET} THEN k ELSE 0 END")
            ).alias("band_rows_dropped"),
            F.sum(F.expr("k * (k - 1) / 2")).cast("long").alias(
                "uncapped_pair_mass"
            ),
            F.sum(
                F.expr(
                    f"CASE WHEN k <= {MAX_BUCKET} THEN k * (k - 1) / 2 "
                    "ELSE 0 END"
                )
            ).cast("long").alias("capped_pair_mass"),
        )
        .collect()[0]
        .asDict()
    )
    out.update(prof)
    out["t_bucket_profile"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    cand = lsh_candidate_pairs(
        sigs, "doc_id", NUM_HASHES, ROWS_PER_BAND, max_bucket=MAX_BUCKET
    ).persist()
    out["n_candidates"] = cand.count()
    out["t_candidates"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    verified = jaccard_pairs(docs, "doc_id", "text", pairs=cand).filter(
        F.col("jaccard") >= JACCARD_THRESH
    )
    out["n_verified"] = verified.count()
    out["t_verify"] = round(time.perf_counter() - t0, 2)

    cand.unpersist()
    sigs.unpersist()
    return out


def main() -> int:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/testdata_sf1"]
    spark = get_spark("dedup_scale_stress")
    before = _rest_totals(spark)
    for d in dirs:
        r = stress(spark, d)
        print(json.dumps(r))
    after = _rest_totals(spark)
    if before is not None and after is not None:
        delta = {k: after[k] - before[k] for k in after}
        print(
            "REST totals: shuffle_read=%s shuffle_write=%s spill_disk=%s"
            % (
                _mb(delta["shuffle_read"]),
                _mb(delta["shuffle_write"]),
                _mb(delta["spill_disk"]),
            )
        )
    else:
        print("REST totals: n/a (set SPARK_GRAFT_UI=1)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
