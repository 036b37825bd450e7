"""REAL audio decode kernels over binary columns — the audio leg of
the multimodal tier (images: llm/multimodal.py decoders; video:
frame-sampling digests).

Synthesis writes genuine RIFF/WAVE PCM files (stdlib ``wave`` writer,
16-bit mono) whose samples are a closed-form integer function of the
doc id, so decoded statistics are SQL-derivable — a full VALUE oracle
over a real decode path.  The decoder does NOT reuse ``wave``: it
parses the RIFF container manually (chunk walk, fmt block, PCM
extraction) so a byte-layout mistake in either direction shows up in
the sums.

100 TB: audio blobs stay opaque binary columns; decode runs in the
Arrow ``mapInPandas`` path — narrow, no shuffle, batch-sized memory.
Real codecs (mp3/flac) slot into the same kernel behind the format
sniff; PCM/WAV is the honest-dependency-free baseline this runtime
can actually execute.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("content_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("content_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sum_samples", T.LongType()),
        T.StructField("sum_squares", T.LongType()),
        T.StructField("peak_max", T.IntegerType()),
        T.StructField("peak_min", T.IntegerType()),
    ]
)


def clip_params(content_id: int) -> tuple[int, int]:
    """(n_samples, sample_rate) as closed-form functions of the id."""
    return 400 + (content_id % 7) * 40, 8000 + (content_id % 3) * 4000


def clip_sample(content_id: int, t: int) -> int:
    """Sample t of clip ``content_id`` — the shared synthesis formula
    (mirrored in the SQL oracle): a mod-2^16 integer polynomial
    recentered to signed 16-bit."""
    return (content_id * 31 + t * t * 7 + t * 13) % 65536 - 32768


def synth_wav_bytes(content_id: int) -> bytes:
    """A genuine 16-bit mono PCM WAV file for the clip."""
    import numpy as np

    n, rate = clip_params(content_id)
    t = np.arange(n, dtype=np.int64)
    samples = (content_id * 31 + t * t * 7 + t * 13) % 65536 - 32768
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes):
    """Manual RIFF/WAVE parse → (sample_rate, n_channels, int16 numpy
    samples).  Walks chunks (a real WAV may carry LIST/fact chunks
    before data), reads the PCM fmt block, and slices the data chunk —
    independent of the stdlib writer used for synthesis."""
    import numpy as np

    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported encoding: fmt={audio_format} bits={bits}")
    samples = np.frombuffer(data, dtype="<i2")
    return sample_rate, n_channels, samples


def synthetic_audio(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(content_id, payload) — real WAV bytes per document id."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(did), synth_wav_bytes(int(did))) for did in pdf[id_col]
            ]
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_SCHEMA.fields]
            )

    return docs.select(id_col).mapInPandas(gen, schema=AUDIO_SCHEMA)


def extract_audio_stats(
    blobs: DataFrame,
    id_col: str = "content_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL decode over mapInPandas: container parse + exact integer
    sample statistics (int64 sums are order-free and engine-portable,
    like the image channel sums)."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, payload in zip(pdf[id_col], pdf[payload_col]):
                rate, ch, samples = decode_wav(bytes(payload))
                s = samples.astype(np.int64)
                rows.append(
                    (
                        int(cid),
                        int(rate),
                        int(ch),
                        int(s.size),
                        int(s.sum()),
                        int((s * s).sum()),
                        int(s.max()),
                        int(s.min()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_STATS_SCHEMA.fields]
            )

    return blobs.select(id_col, payload_col).mapInPandas(
        extract, schema=AUDIO_STATS_SCHEMA
    )


FRAME_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("content_id", T.LongType()),
        T.StructField("frame_id", T.IntegerType()),
        T.StructField("energy", T.LongType()),
        T.StructField("n_zero_cross", T.IntegerType()),
        T.StructField("peak_abs", T.IntegerType()),
    ]
)


def extract_frame_features(
    clips: DataFrame,
    frame_len: int = 160,
    id_col: str = "content_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-level features over decoded PCM — the primitives VAD,
    silence trimming, and segmentation run on: per non-overlapping
    ``frame_len``-sample frame, the integer energy (sum of squares),
    zero-crossing count (sign(x) = x < 0; a flip between consecutive
    IN-FRAME samples counts once), and peak magnitude. The tail
    shorter than a full frame is dropped (only complete frames are
    comparable units).

    All-integer on int16 PCM => exact and order-free, so the whole
    frame table is value-oracle-able. Decode+featurize is one narrow
    mapInPandas pass; 100 TB: frames multiply rows by n/frame_len but
    stay (id, frame) keyed — downstream gates aggregate them back
    map-side."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, payload in zip(pdf[id_col], pdf[payload_col]):
                _rate, _ch, samples = decode_wav(bytes(payload))
                v = np.asarray(samples, dtype=np.int64)
                n_frames = len(v) // frame_len
                for f in range(n_frames):
                    fr = v[f * frame_len : (f + 1) * frame_len]
                    zc = int(((fr[1:] < 0) != (fr[:-1] < 0)).sum())
                    rows.append(
                        (
                            int(cid),
                            f,
                            int((fr * fr).sum()),
                            zc,
                            int(np.abs(fr).max()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_FEATURES_SCHEMA.fields]
            )

    return clips.select(id_col, payload_col).mapInPandas(
        extract, schema=FRAME_FEATURES_SCHEMA
    )
