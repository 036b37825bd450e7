"""Logistic-regression trainer (llm/logreg.py): exact-parity against
the independent single-machine reference, loss monotonicity, and the
frozen gate's quality."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.llm.logreg import (
    log_loss,
    score_linear,
    train_logreg,
    train_logreg_py,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans.llm26 import _COLS, _W, _features
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load

SF0001 = "/root/testdata/sf0.001"


def test_distributed_trainer_matches_reference(spark):
    feats = _features(load(spark, SF0001, "documents"))
    w_spark = train_logreg(feats, _COLS, "y", lr=1.0, iters=25)
    rows = [
        ([r["x_len"], r["x_punct"], r["x_tok"]], float(r["y"]))
        for r in feats.collect()
    ]
    w_py = train_logreg_py(rows, lr=1.0, iters=25)
    for a, b in zip(w_spark, w_py):
        # identical math; only partition-order float summation differs
        assert abs(a - b) < 1e-8, (w_spark, w_py)


def test_loss_decreases_with_training(spark):
    feats = _features(load(spark, SF0001, "documents"))
    losses = [
        log_loss(
            feats, _COLS, "y", train_logreg(feats, _COLS, "y", lr=1.0, iters=i)
        )
        for i in (0, 5, 20)
    ]
    assert losses[0] > losses[1] > losses[2], losses


def test_frozen_gate_quality(spark):
    feats = _features(load(spark, SF0001, "documents"))
    scored = score_linear(feats, _COLS, _W)
    acc = scored.select(
        F.avg((F.col("keep").cast("int") == F.col("y")).cast("double"))
    ).first()[0]
    assert acc >= 0.99
    # both classes actually occur — the gate is not a constant
    kinds = {r["keep"] for r in scored.select("keep").distinct().collect()}
    assert kinds == {True, False}
