"""MJPEG-AVI container + frame sampling (llm/video.py)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_ecommerce_etl_pipeline_spark.llm.jpeg import decode_jpeg, encode_jpeg
from lakehouse_ecommerce_etl_pipeline_spark.llm.video import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)


def _frames(n: int, seed: int = 0) -> tuple[list[bytes], list[np.ndarray]]:
    payloads, images = [], []
    for f in range(n):
        tiles = np.array([[(seed + 13 * tx + 97 * f) % 256 for tx in range(2)]])
        img = np.repeat(np.repeat(tiles, 8, 0), 8, 1).astype(np.uint8)
        images.append(img)
        payloads.append(encode_jpeg(img))
    return payloads, images


def test_container_roundtrip_exact():
    payloads, images = _frames(5, seed=35)
    avi = encode_avi_mjpeg(payloads, 16, 8, fps=10)
    meta = decode_avi_mjpeg(avi)
    assert (meta["width"], meta["height"]) == (16, 8)
    assert meta["n_frames"] == 5 and len(meta["frames"]) == 5
    assert meta["us_per_frame"] == 100_000
    for jp, truth in zip(meta["frames"], images):
        assert np.array_equal(decode_jpeg(jp)[:, :, 0], truth)


def test_word_alignment_with_odd_frame_sizes():
    """JPEG payloads are frequently odd-length; RIFF pads chunks to
    word boundaries and the walker must skip the pad byte."""
    payloads, images = _frames(6, seed=7)
    sizes = {len(p) % 2 for p in payloads}
    assert 1 in sizes, "fixture should include at least one odd payload"
    meta = decode_avi_mjpeg(encode_avi_mjpeg(payloads, 16, 8))
    assert len(meta["frames"]) == 6
    assert [len(f) for f in meta["frames"]] == [len(p) for p in payloads]
    for jp, truth in zip(meta["frames"], images):
        assert np.array_equal(decode_jpeg(jp)[:, :, 0], truth)


def test_not_an_avi_rejected():
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"\x89PNG\r\n\x1a\n")


def test_non_mjpeg_codec_rejected():
    payloads, _ = _frames(1)
    avi = bytearray(encode_avi_mjpeg(payloads, 16, 8))
    idx = avi.find(b"vidsMJPG")
    avi[idx + 4 : idx + 8] = b"H264"
    with pytest.raises(NotImplementedError):
        decode_avi_mjpeg(bytes(avi))


def test_frame_sampling_query_shape(spark):
    """Spark face: every-2nd-frame sampling over a corpus of videos
    matches the closed-form construction."""
    from lakehouse_ecommerce_etl_pipeline_spark.plans import REGISTRY

    df = REGISTRY["q_multimodal_video_frames"].fn(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["content_id"], []).append(r)
    assert len(by_doc) >= 10
    for did, rs in list(by_doc.items())[:40]:
        n_frames = 2 + did % 3
        expect_idx = [f for f in range(n_frames) if f % 2 == 0]
        assert sorted(r["frame_idx"] for r in rs) == expect_idx
        for r in rs:
            f = r["frame_idx"]
            expected = 64 * (
                (7 * did + 97 * f) % 256 + (7 * did + 13 + 97 * f) % 256
            )
            assert (r["width"], r["height"]) == (16, 8)
            assert r["sum_px"] == expected
