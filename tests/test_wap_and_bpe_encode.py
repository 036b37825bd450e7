"""Write-Audit-Publish atomicity and BPE corpus-encoder parity."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

from lakehouse_ecommerce_etl_pipeline_spark.llm.bpe import encode_corpus, train_bpe
from lakehouse_ecommerce_etl_pipeline_spark.operators.rules import positive_amount_rule
from lakehouse_ecommerce_etl_pipeline_spark.operators.wap import (
    AuditFailed,
    write_audit_publish,
)
from lakehouse_ecommerce_etl_pipeline_spark.sources import table as managed

# ------------------------------------------------------------------ WAP


def test_wap_publishes_clean_batch(spark, tmp_path):
    path = str(tmp_path / "t")
    batch = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, amount double")
    report = write_audit_publish(spark, batch, path, [positive_amount_rule("amount")])
    assert report["rejected_rows"] == 0
    assert report["published_version"] == 1
    assert managed.read(spark, path).count() == 2
    # staging dir (sibling of the table root) cleaned after publish
    assert not os.path.exists(path + "__staged__")


def test_wap_bad_batch_publishes_nothing(spark, tmp_path):
    path = str(tmp_path / "t")
    write_audit_publish(
        spark,
        spark.createDataFrame([(1, 10.0)], "k int, amount double"),
        path,
        [positive_amount_rule("amount")],
    )
    bad = spark.createDataFrame([(2, 20.0), (3, -5.0)], "k int, amount double")
    with pytest.raises(AuditFailed) as ei:
        write_audit_publish(spark, bad, path, [positive_amount_rule("amount")])
    assert ei.value.report["rejected_rows"] == 1
    # table untouched: still version 1 with the original row
    assert managed.history(path) == [1]
    assert [r.k for r in managed.read(spark, path).collect()] == [1]
    # staged batch kept for forensics
    assert os.path.exists(path + "__staged__")


# ------------------------------------------------------- BPE encoder


def _py_encode(word: str, merges: list[dict]) -> list[str]:
    """Independent reference encoder: apply each merge rule in
    training order, greedy left-to-right single pass (the fold
    semantics of llm/bpe._merge_pair)."""
    syms = list(word)
    for m in merges:
        out: list[str] = []
        for ch in syms:
            if out and out[-1] == m["left"] and ch == m["right"]:
                out[-1] = m["merged"]
            else:
                out.append(ch)
        syms = out
    return syms


def test_encode_corpus_matches_python_reference(spark):
    rows = [
        (1, "aa ab aa ra abra abracadabra"),
        (2, "banana bandana ban"),
        (3, "aa aa aa"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(spark, docs, 6)
    assert merges, "trainer produced no merges"
    got = {
        r.doc_id: (r.n_tokens, r.n_chars, r.n_multi)
        for r in encode_corpus(spark, docs, merges).collect()
    }
    for doc_id, text in rows:
        toks = [t for w in text.split(" ") if w for t in _py_encode(w, merges)]
        expect = (
            len(toks),
            sum(len(t) for t in toks),
            sum(1 for t in toks if len(t) > 1),
        )
        assert got[doc_id] == expect, (doc_id, got[doc_id], expect)


def test_encode_conserves_characters_on_testdata(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load

    docs = load(spark, "/root/testdata/sf0.001", "documents").limit(50)
    merges = train_bpe(spark, docs, 4)
    enc = encode_corpus(spark, docs, merges)
    from pyspark.sql import functions as F

    raw = docs.select(
        "doc_id",
        F.aggregate(
            F.filter(F.split("text", " "), lambda w: F.length(w) > 0),
            F.lit(0).cast("long"),
            lambda a, w: a + F.length(w),
        ).alias("n_chars_raw"),
    )
    diff = (
        enc.join(raw, "doc_id")
        .filter(F.col("n_chars") != F.col("n_chars_raw"))
        .count()
    )
    assert diff == 0, "merging must conserve characters"
