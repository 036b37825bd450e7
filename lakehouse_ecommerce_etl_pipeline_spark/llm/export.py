"""Training-shard EXPORT: WebDataset-style tar shards from a corpus.

The last step of a training-data pipeline is rarely parquet — loaders
(WebDataset et al.) stream tar shards of raw member files. This
module writes them distributedly: deterministic shard assignment,
one ``applyInPandas`` group per shard, stdlib ``tarfile`` with pinned
metadata so the SAME corpus always produces byte-identical shards
(reproducible exports ⇒ cacheable downstream).

The tar layout is exactly computable (USTAR: 512-byte header +
512-padded data per member, 1024-byte end marker, archive padded to
the 10240-byte record size), so the driver query value-oracles the
writer against closed-form size arithmetic in DuckDB — any header,
padding, or membership bug changes the byte counts.

100 TB: shard count scales with the corpus (fix shard SIZE, not
count); each task builds one shard in memory/disk and ships it to
object storage — payload bytes never enter a shuffle wider than the
single hash-partition to shards. Pinned metadata (mtime=0, uid/gid=0)
is what makes re-exports idempotent at the byte level."""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TAR_RECORD = 10240  # tarfile pads archives to RECORDSIZE (20 blocks)


def tar_shard_bytes(members: list[tuple[str, bytes]]) -> bytes:
    """members (name, payload) → deterministic USTAR archive bytes
    (mtime=0, uid/gid=0, empty uname/gname, mode 0644)."""
    buf = io.BytesIO()
    with tarfile.open(
        fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
    ) as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            info.mode = 0o644
            tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


SHARD_STATS_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.IntegerType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("tar_bytes", T.LongType()),
    ]
)


def export_tar_shards(
    docs: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_dir: str | None = None,
) -> DataFrame:
    """Assign every document to ``id % n_shards``, build one tar per
    shard (members ``doc_<id>.txt`` in ascending id order), optionally
    persist the shards, and return per-shard stats with ``tar_bytes``
    measured from the ACTUAL archive produced."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        members = [
            (f"doc_{int(did):08d}.txt", str(txt).encode("utf-8"))
            for did, txt in zip(pdf[id_col], pdf[text_col])
        ]
        blob = tar_shard_bytes(members)
        sid = int(pdf["__shard"].iloc[0])
        if out_dir is not None:
            import os

            os.makedirs(out_dir, exist_ok=True)
            tmp = f"{out_dir}/shard_{sid:05d}.tar.tmp"
            with open(tmp, "wb") as fh:
                fh.write(blob)
            os.replace(tmp, f"{out_dir}/shard_{sid:05d}.tar")
        return pd.DataFrame(
            [
                (
                    sid,
                    len(members),
                    sum(len(p) for _, p in members),
                    len(blob),
                )
            ],
            columns=["shard_id", "n_docs", "payload_bytes", "tar_bytes"],
        )

    assigned = docs.select(
        F.col(id_col), F.col(text_col),
        (F.col(id_col) % n_shards).cast("int").alias("__shard"),
    )
    return assigned.groupBy("__shard").applyInPandas(
        build, schema=SHARD_STATS_SCHEMA
    )


def read_tar_shard(blob: bytes) -> list[tuple[str, bytes]]:
    """Inverse of ``tar_shard_bytes`` (test/verification helper)."""
    out = []
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        for m in tf.getmembers():
            out.append((m.name, tf.extractfile(m).read()))
    return out


TAR_MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard_path", T.StringType()),
        T.StructField("member_name", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def scan_tar_shards(spark, shards_dir: str) -> DataFrame:
    """Tar shards → one row per member (the WebDataset INGEST side):
    ``binaryFile`` distributes whole-shard bytes (one task per shard —
    the natural parallelism unit; tar is not splittable), and a
    ``mapInPandas`` untar explodes members. Payloads go straight into
    a binary column, so the downstream contract is identical to the
    parquet-native multimodal tables (metadata first, blob column
    pruned until touched)."""

    def untar(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                for name, payload in read_tar_shard(bytes(blob)):
                    rows.append((path, name, payload))
            yield pd.DataFrame(
                rows, columns=["shard_path", "member_name", "payload"]
            )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(shards_dir)
        .select("path", "content")
    )
    return files.mapInPandas(untar, schema=TAR_MEMBER_SCHEMA)
