"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched pandas over ``mapInPandas``.

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this runtime —
the decode kernels are stubbed per the build contract: the Spark-side
plumbing (schema, partitioning, Arrow batch shape, UDF signature) is
real and tested; ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic header-derived fake
(dimensions from the first bytes) stands in.

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


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, str]:
    """(width, height, format) of an image payload.

    STUB: real decoding needs an image library not present in this
    runtime. ``fake=True`` derives deterministic pseudo-dimensions from
    a content digest — exercising the full distributed plumbing.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv (not in this runtime); "
            "pass fake=True for the deterministic test double"
        )
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    fmt = ["png", "jpeg", "webp"][digest[2] % 3]
    return width, height, fmt


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


def resize_stub(
    blobs: DataFrame,
    width: int,
    height: int,
    id_col: str = "content_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize kernel placeholder: real implementation is a mapInPandas
    over payload batches exactly like ``extract_image_metadata``; the
    transform itself needs an image library."""
    raise NotImplementedError(
        "resize requires an image library (not in this runtime); the "
        "distributed shape is identical to extract_image_metadata"
    )


def frame_sample_stub(
    videos: DataFrame, every_n_seconds: float, id_col: str = "content_id"
) -> DataFrame:
    """Video frame-sampling placeholder (needs ffmpeg). One input row →
    many output rows: implement with mapInPandas yielding exploded
    frames, partitioned by content_id to bound memory per task."""
    raise NotImplementedError("frame sampling requires ffmpeg (not in this runtime)")


def synthetic_blobs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic binary payloads from document text — the test
    stand-in for real media files."""
    return docs.select(
        F.col(id_col).alias("content_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )
