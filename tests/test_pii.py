"""PII tier (llm/pii.py): kernel-level checks — detection vs the
injection plan, Luhn parity against a pure-Python reference, and the
scrub invariant (re-detection on scrubbed text finds nothing, while
Luhn-INVALID digit runs survive untouched)."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.llm.pii import (
    CARD_RE,
    EMAIL_RE,
    IPV4_RE,
    PAN_LEN,
    PHONE_RE,
    detect_pii,
    inject_pii,
    scrub_pii,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load

SF0001 = "/root/testdata/sf0.001"


def _luhn_py(pan: str) -> bool:
    """Independent pure-Python Luhn (classic right-to-left statement
    of the algorithm, unlike the engine's fixed-position expansion)."""
    total = 0
    for k, ch in enumerate(reversed(pan)):
        d = int(ch)
        if k % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def _pan_for(doc_id: int) -> str:
    return str((doc_id * doc_id * 31 + doc_id * 7 + 11) % 10**PAN_LEN).zfill(
        PAN_LEN
    )


@pytest.fixture(scope="module")
def seeded(spark):
    docs = load(spark, SF0001, "documents").select("doc_id", "text")
    return inject_pii(docs, "doc_id", "text")


def test_detection_matches_injection_plan(spark, seeded):
    rows = {r["doc_id"]: r for r in detect_pii(seeded, "doc_id", "text").collect()}
    assert rows
    for d, r in rows.items():
        assert r["n_emails"] == 1
        assert r["n_phones"] == (1 if d % 3 == 0 else 0)
        assert r["n_ips"] == (1 if d % 4 == 1 else 0)
        assert r["has_card"] == (d % 5 == 2)
        if d % 5 == 2:
            assert r["card_luhn_valid"] == _luhn_py(_pan_for(d))
        else:
            assert not r["card_luhn_valid"]


def test_corpus_has_both_luhn_outcomes(seeded):
    """The witness is non-hollow: the deterministic PANs include both
    valid and invalid checksums (validity is decided by arithmetic,
    not by construction)."""
    verdicts = {
        _luhn_py(_pan_for(d))
        for d in range(0, 500)
        if d % 5 == 2
    }
    assert verdicts == {True, False}


def test_scrub_removes_all_detectable_pii(spark, seeded):
    scrub_fp = {
        r["doc_id"]: r for r in scrub_pii(seeded, "doc_id", "text").collect()
    }
    # rebuild the scrubbed text independently and re-detect on it
    texts = {r["doc_id"]: r["text"] for r in seeded.collect()}
    for d, raw in texts.items():
        expect = re.sub(EMAIL_RE, "[EMAIL]", raw)
        expect = re.sub(PHONE_RE, "[PHONE]", expect)
        expect = re.sub(IPV4_RE, "[IP]", expect)
        m = re.search(CARD_RE, expect)
        if m and _luhn_py(m.group(0)):
            expect = re.sub(CARD_RE, "[CARD]", expect)
        # the engine's fingerprint matches an independent Python scrub
        import hashlib

        assert scrub_fp[d]["scrub_fp"] == hashlib.md5(
            expect.encode()
        ).hexdigest(), d
        assert scrub_fp[d]["len_scrubbed"] == len(expect)
        # nothing detectable remains except Luhn-invalid digit runs
        assert not re.search(EMAIL_RE, expect)
        assert not re.search(PHONE_RE, expect)
        assert not re.search(IPV4_RE, expect)
        m2 = re.search(CARD_RE, expect)
        if m2:
            assert not _luhn_py(m2.group(0))


def test_luhn_known_vectors(spark):
    """Fixed known Luhn vectors through the ENGINE expression."""
    from lakehouse_ecommerce_etl_pipeline_spark.llm.pii import luhn_valid

    cases = [
        ("4539148803436467", True),   # canonical valid test PAN
        ("4539148803436468", False),  # off-by-one check digit
        ("0000000000000000", True),
        ("0000000000000001", False),
    ]
    df = spark.createDataFrame([(p,) for p, _ in cases], ["pan"])
    got = {r["pan"]: r["ok"] for r in df.select(
        "pan", luhn_valid(F.col("pan")).alias("ok")
    ).collect()}
    for pan, expect in cases:
        assert got[pan] == expect, pan
        assert _luhn_py(pan) == expect, pan
