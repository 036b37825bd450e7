"""Custom Python data source (Spark 4 DataSource API).

The reference's only ingestion surface is files landed in S3 (CSV +
Excel workbooks — glue_jobs/*_etl.py); the DataSource API is how a
Spark-native engine ingests from arbitrary systems (REST feeds,
queues, bespoke formats) without a JVM connector. This module ships a
deterministic synthetic-rows source — the plumbing (registration,
schema, partition planning, per-partition generators) is the real
API; the row generator stands in for a network client.

100 TB: `partitions()` is the parallelism contract — one
InputPartition per split means each executor task pulls only its
slice (here an integer range; in production a shard/offset range).
The driver never materializes rows; generators stream per task.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSourceStreamWriter,
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


def synthetic_value(i: int) -> int:
    """The deterministic payload formula (shared with oracles)."""
    return (i * i * 31 + i * 17) % 1000


class SyntheticRowsDataSource(DataSource):
    """`spark.read.format("synthetic_rows").option("n", N)` — N rows
    (id, v) split across `partitions` independent generators."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_rows"

    def schema(self) -> str:
        return "id bigint, v bigint"

    def reader(self, schema) -> "SyntheticRowsReader":
        return SyntheticRowsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticRowsStreamReader":
        return SyntheticRowsStreamReader(self.options)


class SyntheticRowsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 100_000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self):
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition):
        i = partition.value
        lo = self.n * i // self.num_partitions
        hi = self.n * (i + 1) // self.num_partitions
        for row_id in range(lo, hi):
            yield (row_id, synthetic_value(row_id))


class SyntheticRowsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same source (Spark 4
    SimpleDataSourceStreamReader): offsets are row ids, each
    micro-batch emits the next `batch_rows` ids with the SAME
    deterministic payload formula as the batch reader — stream/batch
    parity by construction, which is what the pytest asserts.

    100 TB: offsets are the replay contract — `read(start)` must be
    a pure function of the offset range so checkpoint recovery
    re-produces identical batches (exactly-once through an
    idempotent sink). A real connector maps these to queue offsets /
    log sequence numbers; the simple reader runs on the driver, so
    it suits control-plane-rate feeds — high-volume streams implement
    the partitioned DataSourceStreamReader instead."""

    def __init__(self, options) -> None:
        self.batch_rows = int(options.get("batch_rows", 100))
        self.max_rows = int(options.get("max_rows", 1000))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.batch_rows, self.max_rows)
        rows = [(i, synthetic_value(i)) for i in range(lo, hi)]
        return iter(rows), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay for recovery: pure function of the offset range
        return iter(
            (i, synthetic_value(i)) for i in range(start["next"], end["next"])
        )


def register_synthetic_source(spark) -> None:
    """Idempotent registration of the custom source."""
    spark.dataSource.register(SyntheticRowsDataSource)


# ---------------------------------------------------------------- writer


class JsonLinesCommit(WriterCommitMessage):
    """Per-task commit message: which file the task produced and how
    many rows it holds (picklable dataclass-style record)."""

    def __init__(self, path: str, n_rows: int) -> None:
        self.path = path
        self.n_rows = n_rows


class JsonLinesDataSource(DataSource):
    """Python-implemented batch SINK (Spark 4 DataSourceWriter API):
    newline-delimited JSON part files under ``path``.  The write face
    of the custom-connector story — per-task write() produces a part
    file and a commit message; the driver-side commit() publishes a
    manifest only after every task reported success, which is the
    all-or-nothing contract a bespoke sink (queue, REST batch ingest,
    tensor-shard writer) must implement.

    100 TB: write() streams each partition's iterator straight to its
    own file — no driver collection, no cross-task coordination until
    the O(#tasks) commit-message reduce; task retries overwrite their
    own part file (idempotent per partition), and abort() removes the
    partial output so failed jobs leave no torn state."""

    @classmethod
    def name(cls) -> str:
        return "pyjsonl"

    def writer(self, schema, overwrite: bool) -> "JsonLinesWriter":
        return JsonLinesWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "JsonLinesStreamWriter":
        return JsonLinesStreamWriter(self.options, schema)


class JsonLinesWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool) -> None:
        import os
        import shutil

        self.path = options["path"]
        self.cols = schema.fieldNames()
        if overwrite and os.path.isdir(self.path):
            shutil.rmtree(self.path)
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator) -> JsonLinesCommit:
        import json
        import os

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        part = os.path.join(self.path, f"part-{pid:05d}.json")
        tmp = part + ".inprogress"
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(
                    json.dumps(
                        dict(zip(self.cols, row)), default=str
                    )
                )
                f.write("\n")
                n += 1
        os.replace(tmp, part)  # atomic per-task publish
        return JsonLinesCommit(part, n)

    def commit(self, messages) -> None:
        import json
        import os

        manifest = {
            "files": sorted(m.path for m in messages if m is not None),
            "rows": sum(m.n_rows for m in messages if m is not None),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonLinesStreamWriter(DataSourceStreamWriter):
    """Python-implemented STREAMING sink (Spark 4 DataSourceStreamWriter
    API) — the streaming face of the JSONL sink.  Each micro-batch's
    tasks write part files keyed by (batchId, partitionId); the
    driver-side commit(messages, batchId) appends a per-batch manifest
    line only after every task reported success.  Exactly-once falls
    out of idempotent file names: a replayed batch (restart between
    write and checkpoint advance) rewrites the SAME part files and
    re-publishes the same manifest line, so the artifact converges no
    matter where the stream was interrupted.

    100 TB: identical executor-direct write path as the batch writer —
    no driver funnel, O(#tasks) commit messages per batch; the
    checkpoint holds only source offsets, the sink's own state is the
    manifest."""

    def __init__(self, options, schema) -> None:
        import os

        self.path = options["path"]
        self.cols = schema.fieldNames()
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator) -> JsonLinesCommit:
        import json
        import os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        # streaming tasks expose the batch id via the task-local
        # property set by the micro-batch execution
        batch_id = ctx.getLocalProperty("streaming.sql.batchId")
        tag = batch_id if batch_id is not None else "na"
        part = os.path.join(self.path, f"part-{tag}-{pid:05d}.json")
        tmp = part + ".inprogress"
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(dict(zip(self.cols, row)), default=str))
                f.write("\n")
                n += 1
        os.replace(tmp, part)
        return JsonLinesCommit(part, n)

    def commit(self, messages, batchId: int) -> None:
        import json
        import os

        line = {
            "batch": batchId,
            "files": sorted(m.path for m in messages if m is not None),
            "rows": sum(m.n_rows for m in messages if m is not None),
        }
        manifest = os.path.join(self.path, "_STREAM_MANIFEST.jsonl")
        # idempotent append: drop any previous line for this batch id
        lines = []
        if os.path.exists(manifest):
            with open(manifest) as f:
                lines = [
                    ln
                    for ln in f.read().splitlines()
                    if ln and json.loads(ln)["batch"] != batchId
                ]
        lines.append(json.dumps(line))
        with open(manifest, "w") as f:
            f.write("\n".join(lines) + "\n")

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


def register_jsonl_sink(spark) -> None:
    """Idempotent registration of the custom Python sink."""
    spark.dataSource.register(JsonLinesDataSource)
