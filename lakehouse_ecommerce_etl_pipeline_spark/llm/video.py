"""MJPEG-in-AVI video: a REAL pure-Python container + codec path.

Round 2 gated video behind "needs ffmpeg". That stays true for
inter-frame codecs (H.264 etc.), but the classic Motion-JPEG AVI —
a RIFF container whose every frame is an independent baseline JPEG —
needs nothing beyond a RIFF chunk walker and the JPEG codec this repo
already has (`llm/jpeg.py`). So frame sampling over MJPEG is now a
real decode path, not a stub:

- ``encode_avi_mjpeg``: spec-shaped RIFF('AVI ') writer — LIST hdrl
  (avih main header + LIST strl with a 'vids'/'MJPG' strh and a
  BITMAPINFOHEADER strf), LIST movi with word-aligned '00dc' frame
  chunks, and an idx1 index. Exists for offline testability (there is
  no ffmpeg to produce fixtures).
- ``decode_avi_mjpeg``: chunk walk (LIST recursion, word alignment),
  main-header metadata (dims, frame interval), '00dc' frame payload
  extraction. Returns metadata + the raw JPEG bytes per frame; frame
  DECODE is delegated to ``llm.jpeg.decode_jpeg``.
- ``frame_sample_stats``: the Spark face — one video row in, one row
  per SAMPLED frame out (every k-th), decoded to exact pixel stats
  inside a single Arrow-batched ``mapInPandas`` pass.

100 TB: video payloads are the extreme case of "binaries stay out of
shuffles" — the sample-then-decode runs where the bytes already are,
emits only small per-frame stat rows, and the sampling rate bounds
decode cost per input byte. Inter-frame codecs remain honestly gated
(``frame_sample_stub``)."""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """JPEG frame payloads → minimal valid MJPEG AVI (RIFF) bytes."""

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(fourcc: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", fourcc + data)

    n = len(frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        0,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids",
        b"MJPG",
        0, 0, 0,  # flags, priority, language, initial frames packed below
        0,  # dwInitialFrames
        1,  # dwScale
        fps,  # dwRate
        0,  # dwStart
        n,  # dwLength
        0,  # dwSuggestedBufferSize
        0xFFFFFFFF & -1,  # dwQuality (-1 default)
        0,  # dwSampleSize
        0, 0, 0, 0,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0x47504A4D,  # 'MJPG' compression
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_frames = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_frames)
    # idx1: one entry per frame (offset relative to movi fourcc start)
    idx_entries = []
    off = 4  # skip the 'movi' fourcc
    for f in frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(payload: bytes) -> dict:
    """AVI bytes → {"width", "height", "n_frames", "us_per_frame",
    "frames": [jpeg_bytes, ...]} via a proper word-aligned RIFF walk.
    Rejects non-AVI RIFFs and non-MJPEG streams."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    meta: dict = {"frames": []}

    def walk(data: bytes, pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            if fourcc == b"LIST":
                ltype = data[body_start : body_start + 4]
                if ltype in (b"hdrl", b"strl", b"movi"):
                    walk(data, body_start + 4, body_start + size)
            elif fourcc == b"avih":
                vals = struct.unpack_from("<14I", data, body_start)
                meta["us_per_frame"] = vals[0]
                meta["n_frames"] = vals[4]
                meta["width"], meta["height"] = vals[8], vals[9]
            elif fourcc == b"strh":
                if data[body_start : body_start + 4] == b"vids":
                    codec = data[body_start + 4 : body_start + 8]
                    if codec not in (b"MJPG", b"mjpg"):
                        raise NotImplementedError(
                            f"only MJPEG AVI supported (codec {codec!r})"
                        )
            elif fourcc in (b"00dc", b"00db"):
                meta["frames"].append(data[body_start : body_start + size])
            pos = body_start + size + (size % 2)

    walk(payload, 12, len(payload))
    if not meta["frames"]:
        raise ValueError("AVI contains no video frame chunks")
    return meta


FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("content_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sum_px", T.LongType()),
    ]
)


def frame_sample_stats(
    videos: DataFrame,
    every_n: int = 2,
    id_col: str = "content_id",
    payload_col: str = "payload",
) -> DataFrame:
    """One video row → one row per sampled frame (indices 0, k, 2k, …)
    with exact decoded pixel sums. Container walk + JPEG decode both
    happen inside one mapInPandas pass; only stat rows leave it."""
    import numpy as np

    from lakehouse_ecommerce_etl_pipeline_spark.llm.jpeg import decode_jpeg

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, payload in zip(pdf[id_col], pdf[payload_col]):
                meta = decode_avi_mjpeg(bytes(payload))
                for fi in range(0, len(meta["frames"]), every_n):
                    arr = decode_jpeg(meta["frames"][fi])
                    rows.append(
                        (
                            int(vid),
                            fi,
                            arr.shape[1],
                            arr.shape[0],
                            int(arr.sum(dtype=np.int64)),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["content_id", "frame_idx", "width", "height", "sum_px"],
            )

    return videos.select(id_col, payload_col).mapInPandas(
        sample, schema=FRAME_STATS_SCHEMA
    )
