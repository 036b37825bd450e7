"""Frame-feature kernel parity against an independent pure-Python
loop (no numpy vector tricks), plus frame-boundary semantics."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_ecommerce_etl_pipeline_spark.llm.audio import (
    clip_params,
    clip_sample,
    decode_wav,
    synth_wav_bytes,
)


def _reference_features(samples, frame_len):
    """Independent scalar-loop implementation."""
    out = []
    for f in range(len(samples) // frame_len):
        fr = samples[f * frame_len : (f + 1) * frame_len]
        energy = sum(int(v) * int(v) for v in fr)
        zc = sum(
            1
            for a, b in zip(fr[:-1], fr[1:])
            if (a < 0) != (b < 0)
        )
        out.append((f, energy, zc, max(abs(int(v)) for v in fr)))
    return out


def test_frame_features_parity(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.llm.audio import (
        extract_frame_features,
    )

    ids = [0, 3, 11, 123]
    clips = spark.createDataFrame(
        [(i, bytearray(synth_wav_bytes(i))) for i in ids],
        "content_id long, payload binary",
    )
    got = {
        (r.content_id, r.frame_id): (r.energy, r.n_zero_cross, r.peak_abs)
        for r in extract_frame_features(clips, frame_len=160).collect()
    }
    total = 0
    for cid in ids:
        _rate, _ch, samples = decode_wav(synth_wav_bytes(cid))
        for f, energy, zc, peak in _reference_features(list(samples), 160):
            assert got[(cid, f)] == (energy, zc, peak), (cid, f)
            total += 1
    assert total == len(got)
    # tail samples short of a full frame must be dropped
    for cid in ids:
        n, _ = clip_params(cid)
        assert max(f for c, f in got if c == cid) == n // 160 - 1


def test_synthesis_formula_matches_decoder():
    """clip_sample (the oracle's formula) is what the WAV actually
    holds — the bridge both oracles rest on."""
    for cid in (1, 7, 500):
        _r, _c, samples = decode_wav(synth_wav_bytes(cid))
        for t in (0, 1, 159, 160, len(samples) - 1):
            assert int(samples[t]) == clip_sample(cid, t)
