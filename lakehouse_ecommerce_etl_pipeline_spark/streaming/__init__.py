"""Structured Streaming tier (SURVEY.md §2.10).

The reference's "real-time" story is event-driven batch (S3 event →
Lambda → Step Function per file). The Spark-native equivalent is a
file-source stream: new files under the raw zone are discovered by the
stream, flow through the same validate/dedup/merge operators, and
commit exactly-once via foreachBatch — replacing three AWS services
with one query.
"""
