"""Tar-shard export (llm/export.py): byte determinism + round-trip."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_ecommerce_etl_pipeline_spark.llm.export import (
    TAR_RECORD,
    export_tar_shards,
    read_tar_shard,
    tar_shard_bytes,
)


def test_tar_bytes_match_closed_form_and_roundtrip():
    members = [
        ("doc_00000001.txt", b"x" * 1),
        ("doc_00000002.txt", b"y" * 512),
        ("doc_00000003.txt", b"z" * 513),
        ("doc_00000004.txt", b""),
    ]
    blob = tar_shard_bytes(members)
    member_bytes = sum(512 + (len(p) + 511) // 512 * 512 for _, p in members)
    expected = (member_bytes + 1024 + TAR_RECORD - 1) // TAR_RECORD * TAR_RECORD
    assert len(blob) == expected
    assert read_tar_shard(blob) == members


def test_export_is_byte_deterministic():
    members = [("doc_00000009.txt", b"hello world")]
    assert tar_shard_bytes(members) == tar_shard_bytes(members)


def test_spark_export_persists_readable_shards(spark, tmp_path):
    out = str(tmp_path / "shards")
    docs = spark.createDataFrame(
        [(i, f"document number {i} " * (i + 1)) for i in range(20)],
        "doc_id long, text string",
    )
    stats = {
        r["shard_id"]: r
        for r in export_tar_shards(docs, n_shards=4, out_dir=out).collect()
    }
    assert sorted(stats) == [0, 1, 2, 3]
    assert sum(r["n_docs"] for r in stats.values()) == 20
    # every persisted shard reads back with the right members, in id order
    for sid in range(4):
        path = f"{out}/shard_{sid:05d}.tar"
        with open(path, "rb") as fh:
            blob = fh.read()
        assert len(blob) == stats[sid]["tar_bytes"]
        members = read_tar_shard(blob)
        ids = [int(n.removeprefix("doc_").removesuffix(".txt")) for n, _ in members]
        assert ids == sorted(ids)
        assert all(i % 4 == sid for i in ids)
        for name, payload in members:
            i = int(name.removeprefix("doc_").removesuffix(".txt"))
            assert payload.decode() == f"document number {i} " * (i + 1)
