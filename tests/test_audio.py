from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

from lakehouse_ecommerce_etl_pipeline_spark.llm.audio import (
    clip_params,
    clip_sample,
    decode_wav,
    synth_wav_bytes,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans.llm15 import (
    q_funnel_no_interference,
    q_multimodal_audio_stats,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load

SF0001 = "/root/testdata/sf0.001"


def test_wav_roundtrip_bit_exact():
    for cid in [0, 1, 6, 41, 997]:
        n, rate = clip_params(cid)
        payload = synth_wav_bytes(cid)
        got_rate, ch, samples = decode_wav(payload)
        assert got_rate == rate
        assert ch == 1
        assert samples.size == n
        assert [int(s) for s in samples[:5]] == [
            clip_sample(cid, t) for t in range(5)
        ]
        assert int(samples[-1]) == clip_sample(cid, n - 1)


def test_decoder_skips_extra_chunks():
    payload = bytearray(synth_wav_bytes(7))
    # splice an unknown word-aligned chunk between 'WAVE' and 'fmt '
    extra = b"LIST" + (6).to_bytes(4, "little") + b"INFOxx"
    spliced = bytes(payload[:12]) + extra + bytes(payload[12:])
    # RIFF size field must cover the insertion
    spliced = (
        spliced[:4]
        + (len(spliced) - 8).to_bytes(4, "little")
        + spliced[8:]
    )
    rate, ch, samples = decode_wav(spliced)
    n, expected_rate = clip_params(7)
    assert rate == expected_rate and samples.size == n


def test_decoder_rejects_non_wav():
    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all" * 4)


def test_audio_stats_match_formula(spark):
    rows = {
        r["content_id"]: r
        for r in q_multimodal_audio_stats(spark, SF0001).limit(2000).collect()
    }
    for cid in list(rows)[:20]:
        n, rate = clip_params(cid)
        samples = [clip_sample(cid, t) for t in range(n)]
        r = rows[cid]
        assert r["sample_rate"] == rate
        assert r["n_samples"] == n
        assert r["sum_samples"] == sum(samples)
        assert r["sum_squares"] == sum(s * s for s in samples)
        assert r["peak_max"] == max(samples)
        assert r["peak_min"] == min(samples)


def test_funnel_no_interference_bounds(spark):
    rows = q_funnel_no_interference(spark, SF0001).collect()
    ev = load(spark, SF0001, "events")
    from pyspark.sql import functions as F

    purchases = ev.filter(F.col("event_type") == "purchase").count()
    assert sum(r["n_purchases"] for r in rows) == purchases
    for r in rows:
        assert 0 <= r["n_clean"] <= r["n_purchases"]
