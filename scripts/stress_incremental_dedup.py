#!/usr/bin/env python
"""Scale-stress the incremental dedup path (VERDICT r5 item 6): prove
the O(batch) claim by probing the SAME arriving batch against a
persisted band index built over a corpus that grows 10×.

Protocol (mirrors q_dedup_incremental's production shape, but with
the index genuinely PERSISTED between phases, as a pipeline would):

1. Per corpus scale (sf0.1, then the 10× sf1 derivation):
   - index build (once per corpus): rep-collapse -> 8-perm universal
     minhash -> band explode -> write parquet band index + rep texts
     + rep group sizes.  Recorded: build secs, index rows, bytes.
   - batch probe (the per-ingest hot path, measured): sign the FIXED
     batch (sf0.1's doc_id % 5 == 0 slice, identical at both scales),
     band it, equi-join against the PERSISTED index, exact-Jaccard
     verify collisions against the persisted rep texts, count
     verdicts.  Recorded: probe secs + REST stage deltas (shuffle
     bytes, spill).

Pass criteria: probe time ~flat as the corpus grows 10× (the index
side of the equi-join grows, but only 16-byte band hashes of REPS
shuffle and the batch side is constant), zero spill at both scales.

Writes the measured table to stdout; paste into
docs/SCALE_STRESS_SF1.md §r6.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.llm.dedup import (
    jaccard_pairs,
    lsh_band,
    minhash_signatures_universal,
)
from lakehouse_ecommerce_etl_pipeline_spark.llm.components import token_set_reps
from lakehouse_ecommerce_etl_pipeline_spark.plans.llm import (
    _NUM_HASHES,
    _ROWS_PER_BAND,
)
from lakehouse_ecommerce_etl_pipeline_spark.session import get_spark

_THRESH = 0.5
_NEW_MOD = 5
BATCH_DIR = "/root/testdata/sf0.1"
SCALES = [("sf0.1", "/root/testdata/sf0.1"), ("sf1", "/tmp/testdata_sf1")]
WORK = "/tmp/lakehouse_stress_inc_dedup"

# gen_scaled_testdata replicates sf0.1 with key stride 10000 but
# REPLICATED text, which rep-collapse would flatten back to a
# constant-size index (vacuous 10x).  Salting every token with the
# replica id makes replicas mutually DISSIMILAR — the realistic
# bigger-corpus case: the index genuinely grows 10x while the fixed
# batch's true match set (replica 0) stays constant.
_SALT = (
    "array_join(transform(split(text, ' '), "
    "x -> concat(cast(doc_id div 10000 as string), '_', x)), ' ')"
)


def _salted(df):
    return df.withColumn("text", F.expr(_SALT))


def _stage_totals(ui: str) -> dict[str, int]:
    apps = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10)
    )
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=10,
        )
    )
    tot = {"shuffle_read": 0, "shuffle_write": 0, "spill_disk": 0,
           "spill_mem": 0}
    for st in stages:
        tot["shuffle_read"] += st.get("shuffleReadBytes", 0)
        tot["shuffle_write"] += st.get("shuffleWriteBytes", 0)
        tot["spill_disk"] += st.get("diskBytesSpilled", 0)
        tot["spill_mem"] += st.get("memoryBytesSpilled", 0)
    return tot


def _dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
    )


def build_index(spark, corpus_df, out_dir: str) -> dict:
    t0 = time.time()
    reps_map = token_set_reps(corpus_df, "doc_id", "text")
    gsz = reps_map.groupBy("rep_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("gsz")
    )
    rep_texts = (
        corpus_df.join(reps_map, "doc_id")
        .filter(F.col("doc_id") == F.col("rep_id"))
        .select("doc_id", "text")
    )
    sigs = minhash_signatures_universal(
        rep_texts, "doc_id", "text", _NUM_HASHES
    )
    bands = lsh_band(sigs, "doc_id", _NUM_HASHES, _ROWS_PER_BAND)
    bands.write.mode("overwrite").parquet(f"{out_dir}/bands")
    rep_texts.write.mode("overwrite").parquet(f"{out_dir}/rep_texts")
    gsz.write.mode("overwrite").parquet(f"{out_dir}/gsz")
    n_bands = spark.read.parquet(f"{out_dir}/bands").count()
    return {
        "build_secs": round(time.time() - t0, 2),
        "index_rows": n_bands,
        "index_bytes": _dir_bytes(out_dir),
    }


def probe_batch(spark, batch_df, idx_dir: str, ui: str) -> dict:
    before = _stage_totals(ui)
    t0 = time.time()
    bands_idx = spark.read.parquet(f"{idx_dir}/bands")
    rep_texts = spark.read.parquet(f"{idx_dir}/rep_texts")
    gsz = spark.read.parquet(f"{idx_dir}/gsz")

    new_m = token_set_reps(batch_df, "doc_id", "text")
    new_reps = (
        batch_df.join(new_m, "doc_id")
        .filter(F.col("doc_id") == F.col("rep_id"))
        .select("doc_id", "text")
    )
    sig_new = minhash_signatures_universal(
        new_reps, "doc_id", "text", _NUM_HASHES
    )
    bands_new = lsh_band(sig_new, "doc_id", _NUM_HASHES, _ROWS_PER_BAND)
    cand = (
        bands_new.alias("a")
        .join(
            bands_idx.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    both_texts = new_reps.unionByName(rep_texts).dropDuplicates(["doc_id"])
    ver = jaccard_pairs(both_texts, "doc_id", "text", pairs=cand).filter(
        F.col("jaccard") >= _THRESH
    )
    verdict = (
        new_m.join(
            ver.join(gsz, ver["id_b"] == gsz["rep_id"])
            .groupBy("id_a")
            .agg(F.sum("gsz").alias("n_dups")),
            new_m["rep_id"] == F.col("id_a"),
            "left",
        )
        .select(
            "doc_id", (F.coalesce("n_dups", F.lit(0)) > 0).alias("is_dup")
        )
    )
    n_batch = verdict.count()
    n_cand = cand.count()
    n_dup = verdict.filter("is_dup").count()
    secs = round(time.time() - t0, 2)
    after = _stage_totals(ui)
    delta = {k: after[k] - before[k] for k in after}
    return {
        "probe_secs": secs,
        "batch_docs": n_batch,
        "cand_pairs": n_cand,
        "dups": n_dup,
        **delta,
    }


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_UI", "true")
    spark = get_spark("stress-inc-dedup")
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        print("no Spark UI; set SPARK_GRAFT_UI=true", file=sys.stderr)
        return 1
    batch = _salted(
        spark.read.parquet(f"{BATCH_DIR}/documents.parquet")
        .filter(F.col("doc_id") % _NEW_MOD == 0)
        .select("doc_id", "text")
    )
    rows = []
    for tag, sf_dir in SCALES:
        if not os.path.isdir(sf_dir):
            print(f"SKIP {tag}: {sf_dir} missing "
                  "(run scripts/gen_scaled_testdata.py 10 /tmp/testdata_sf1)")
            continue
        corpus = _salted(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") % _NEW_MOD != 0)
            .select("doc_id", "text")
        )
        idx_dir = os.path.join(WORK, tag)
        shutil.rmtree(idx_dir, ignore_errors=True)
        b = build_index(spark, corpus, idx_dir)
        p = probe_batch(spark, batch, idx_dir, ui)
        rows.append((tag, corpus.count(), b, p))
        print(f"{tag}: corpus={rows[-1][1]} build={b} probe={p}")
    print("\n| corpus | docs | index rows | index MB | build s | "
          "probe s | cand | dups | probe shuffle MB | spill |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for tag, n, b, p in rows:
        sh = (p["shuffle_read"] + p["shuffle_write"]) / 2 / 1e6
        spill = p["spill_disk"] + p["spill_mem"]
        print(
            f"| {tag} | {n} | {b['index_rows']} | "
            f"{b['index_bytes'] / 1e6:.1f} | {b['build_secs']} | "
            f"| {p['probe_secs']} | {p['cand_pairs']} | {p['dups']} | "
            f"{sh:.1f} | {spill} |"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
