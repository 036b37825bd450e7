"""Sinks: partitioned writes, MERGE upsert, quarantine, markers, DDL."""
