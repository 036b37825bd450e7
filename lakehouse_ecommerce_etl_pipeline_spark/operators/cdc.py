"""Change-data-feed between two table snapshots — the Delta CDF
(``table_changes``) analogue for the versioned-parquet fallback, and
the incremental-consumption primitive the reference's downstream
(Athena readers re-scanning full tables, README.md:30) lacks.

100 TB notes: the diff is one full-outer join on the key — shuffle
both sides by key once; with bucketed/co-partitioned snapshots the
exchange disappears entirely. Emitting pre/post images as separate
rows (not a struct pair) keeps the output unnested for SQL consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHANGE_COL = "_change_type"


def table_changes(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """Row-level changes that turn ``old`` into ``new``, keyed by
    ``keys`` (unique in each snapshot — the MERGE invariant): one row
    per insert/delete, two rows (update_preimage, update_postimage)
    per changed key. Column order: key cols, payload cols, _change_type.
    """
    payload = [c for c in old.columns if c not in keys]
    if new.columns != old.columns:
        new = new.select(*old.columns)
    o = old.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        F.struct(*payload).alias("__old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        F.struct(*payload).alias("__new"),
    )
    cond = [o[f"__k_{k}"] == n[f"__nk_{k}"] for k in keys]
    joined = o.join(n, cond, "full_outer")

    old_present = F.col("__old").isNotNull()
    new_present = F.col("__new").isNotNull()
    # null-safe struct compare: a NULL payload field must still count
    # as a difference against a non-NULL one (IS DISTINCT FROM)
    changed = old_present & new_present & ~F.col("__old").eqNullSafe(F.col("__new"))

    # classify and emit in ONE pass over the joined frame: each row
    # yields 0 (unchanged), 1 (insert/delete) or 2 (update pre+post)
    # tagged image structs, exploded to change rows.  A filter+union
    # formulation would re-execute the full-outer join once per
    # branch — 4 scans of both snapshots instead of one.
    tag = lambda img, t: F.struct(  # noqa: E731
        F.col(img).alias("img"), F.lit(t).alias("t")
    )
    emitted = F.when(
        changed,
        F.array(
            tag("__old", "update_preimage"), tag("__new", "update_postimage")
        ),
    ).when(
        new_present & ~old_present, F.array(tag("__new", "insert"))
    ).when(old_present & ~new_present, F.array(tag("__old", "delete")))
    # rows matching no branch (unchanged) get NULL → explode drops them
    return joined.select(
        *[F.coalesce(f"__k_{k}", f"__nk_{k}").alias(k) for k in keys],
        F.explode(emitted).alias("__e"),
    ).select(
        *keys,
        *[F.col(f"__e.img.{c}").alias(c) for c in payload],
        F.col("__e.t").alias(CHANGE_COL),
    )


def read_changes(
    spark: SparkSession, path: str, v_from: int, v_to: int, keys: list[str]
) -> DataFrame:
    """CDF between two published versions of a managed table
    (sources/table.py snapshots): what Delta exposes as
    ``table_changes(t, v_from, v_to)``."""
    from lakehouse_ecommerce_etl_pipeline_spark.sources import table as managed

    old = spark.read.parquet(managed.snapshot_dir(path, v_from))
    new = spark.read.parquet(managed.snapshot_dir(path, v_to))
    return table_changes(old, new, keys)
