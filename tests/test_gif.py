"""GIF codec invariants: LZW round-trips (incl. KwKwK and the 4096
dictionary reset), container framing robustness, 89a extension
skipping, and the synthetic-corpus closed form the oracle relies on."""

from __future__ import annotations

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_ecommerce_etl_pipeline_spark.llm.gif import (
    decode_gif,
    encode_gif,
    lzw_compress,
    lzw_decompress,
)
from lakehouse_ecommerce_etl_pipeline_spark.llm.multimodal import (
    decode_image_array,
)


def test_lzw_round_trip_families():
    rng = np.random.RandomState(11)
    cases = [
        b"",
        b"\x00" * 5000,  # single symbol: immediate KwKwK chains
        b"abababababab".replace(b"a", b"\x01").replace(b"b", b"\x02"),
        bytes(rng.randint(0, 8, 60000, dtype=np.uint8)),  # forces reset
        bytes(rng.randint(0, 2, 100, dtype=np.uint8)),
    ]
    for data in cases:
        for mcs in (2, 3, 8):
            if data and max(data) >= (1 << mcs):
                continue
            assert lzw_decompress(lzw_compress(data, mcs), mcs) == data


def test_encode_decode_identity():
    rng = np.random.RandomState(3)
    for h, w, n in [(1, 1, 2), (7, 13, 8), (40, 60, 16), (64, 64, 256)]:
        idx = rng.randint(0, n, size=(h, w)).astype(np.uint8)
        pal = rng.randint(0, 256, size=(n, 3)).astype(np.uint8)
        out = decode_gif(encode_gif(idx, pal))
        assert out.shape == (h, w, 3)
        assert (out == pal[idx]).all()


def test_dispatch_magic():
    idx = np.zeros((2, 2), np.uint8)
    pal = np.array([[9, 8, 7], [1, 2, 3]], np.uint8)
    arr, fmt = decode_image_array(encode_gif(idx, pal))
    assert fmt == "gif" and (arr == [9, 8, 7]).all()


def test_gif89a_extension_blocks_skipped():
    """Insert a graphic-control extension after the color table and
    flip the version to 89a — decode must skip it and still land on
    the image descriptor."""
    idx = np.arange(4, dtype=np.uint8).reshape(2, 2)
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    payload = bytearray(encode_gif(idx, pal))
    payload[4:6] = b"9a"
    gct_end = 13 + 3 * 4
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE + terminator
    patched = bytes(payload[:gct_end]) + ext + bytes(payload[gct_end:])
    assert (decode_gif(patched) == pal[idx]).all()


def test_subblock_refragmentation_irrelevant():
    """The LZW stream split into 1-byte sub-blocks decodes the same —
    framing and coding are independent layers."""
    idx = (np.add.outer(np.arange(9), np.arange(17)) % 8).astype(np.uint8)
    pal = (np.arange(24, dtype=np.uint8).reshape(8, 3) * 7) % 256
    orig = encode_gif(idx, pal)
    # locate the data stream: header 13 + gct 24, image desc 10, mcs 1
    start = 13 + 24 + 10 + 1
    stream = bytearray()
    pos = start
    while orig[pos]:
        ln = orig[pos]
        stream += orig[pos + 1 : pos + 1 + ln]
        pos += 1 + ln
    refrag = b"".join(bytes([1, b]) for b in stream) + b"\x00\x3b"
    assert (decode_gif(orig[:start] + refrag) == pal[idx]).all()


def test_synthetic_closed_form():
    """One synthetic image decoded by hand must match the oracle's
    closed form (the lattice formula the SQL twin replays)."""
    from lakehouse_ecommerce_etl_pipeline_spark.llm.gif import encode_gif

    did = 123
    w, h = 8 + did % 9, 6 + did % 5
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    idx = ((did + x + 3 * y) % 8).astype(np.uint8)
    i = np.arange(8)
    pal = np.stack(
        [
            (did + 31 * i) % 256,
            (7 * did + 57 * i) % 256,
            (13 * did + 89 * i) % 256,
        ],
        axis=1,
    ).astype(np.uint8)
    arr = decode_gif(encode_gif(idx, pal))
    flat = idx.ravel()
    assert arr.reshape(-1, 3).sum(axis=0).tolist() == [
        int(((did + 31 * flat) % 256).sum()),
        int(((7 * did + 57 * flat) % 256).sum()),
        int(((13 * did + 89 * flat) % 256).sum()),
    ]


def test_interlace_honestly_rejected():
    idx = np.zeros((2, 2), np.uint8)
    pal = np.array([[0, 0, 0], [1, 1, 1]], np.uint8)
    payload = bytearray(encode_gif(idx, pal))
    # image descriptor packed byte: header 13 + gct 6 bytes... compute:
    desc = 13 + 3 * 2  # gct has 2 entries here
    assert payload[desc] == 0x2C
    payload[desc + 9] |= 0x40  # set interlace flag
    try:
        decode_gif(bytes(payload))
        raise AssertionError("interlace should be rejected")
    except NotImplementedError:
        pass
