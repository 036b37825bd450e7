"""Exact global ranks WITHOUT a single-partition window.

``ROW_NUMBER()/NTILE(k) OVER (ORDER BY ...)`` with no PARTITION BY is
the one window shape that cannot scale: Spark moves every row to one
reducer (the WindowExec "moving all data to a single partition"
warning).  When the ORDER BY is a TOTAL order (unique tiebreaker),
the same values are computable with no global sort:

1. **Boundary probe** — ~``n_buckets`` percentile cuts of the primary
   order column, collected to the driver ONCE (an O(n_buckets)
   action, the audited O(1)-driver-decision pattern).  The cuts
   become plan LITERALS, so every later step sees identical
   boundaries — no dependence on exchange reuse or recompute
   determinism.  The same pass counts NULL/NaN primaries and FAILS
   FAST if any exist (a NULL bucket expression would otherwise
   silently mis-rank instead of erroring).
2. **Bucket assignment** — each row's bucket is the count of cuts
   strictly below (above, for DESC) its primary value: a codegen'd
   chain of literal comparisons, order-preserving because rows tied
   on the primary always share a bucket.
3. **Counts → literal offsets** — per-bucket row counts via one
   map-side-combined aggregate, collected (O(n_buckets) rows) and
   turned into a LITERAL CASE-WHEN offset chain — no unpartitioned
   window at any grain, no join.  (Not ``element_at`` on a literal
   array: under ANSI that expression is can-throw and measured ~8×
   slower per row than the codegen'd when-chain — 41 s vs 5 s on a
   2.9 M-row rank pass.)
4. **Skew guard / tie-class auto-split** — rows tied with each other
   on the primary always collapse into ONE bucket, so a low-cardinality
   primary (e.g. lines-per-order ∈ 1..7) makes one bucket carry a
   constant fraction of the data no matter how many cuts were probed.
   When a bucket exceeds ``4×`` its fair share (and the floor below
   which skew is irrelevant), and the caller named a numeric
   ``secondary`` order key, the fat TIE CLASSES (min == max primary
   within the bucket) are split by percentile cuts of the secondary
   WITHIN each class — order-preserving because inside a tie class
   the total order continues with the secondary.  Fat buckets that
   are not pure tie classes, or with no usable secondary, raise
   (``on_skew="accept"`` keeps the fat bucket for call sites with a
   documented bound on the tie-class mass).
5. **Local ranks** — ``row_number`` partitioned BY BUCKET (balanced
   hash exchange, per-group sort) + the literal offset chain = the
   exact global row number; NTILE follows by closed-form integer
   arithmetic on (rn, N) — exact integer division (``div``), never
   a float quotient that could misround across a tile boundary at
   >2^26 rows per tile.

Every step is deterministic and value-identical to the global-window
form for ANY total order — the formerly single-partition production
plans (equi-depth histogram, calibration deciles, quartile
contingency, systematic sample, CCNet buckets, RFM, ABC, KS drift)
are pytest-pinned equal to their window twins and share their
unchanged DuckDB oracles.

100 TB: two narrow scans of the fact (probe + counts; the rank pass
reuses the counts scan's lineage) and one balanced shuffle on bucket;
the tie-class split adds one bounded probe + recount ONLY when skew
is detected.  The probe/counts/rank trio executes the upstream
lineage up to 3×: pass ``materialize=`` (e.g. a ``spill_final``
closure) when the upstream is expensive, so recompute-vs-spill is a
caller's explicit choice (Spearman measured recompute 2.8 s vs spill
3.4 s at sf0.1 for a cheap upstream; Theil-Sen spills its pair
table).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_BUCKETS = 64

# a bucket is "fat" when it holds more than 4× its fair share AND
# more than this many rows (below the floor, one window partition
# handles it trivially — unit tests and tiny scale factors never trip)
SKEW_FLOOR_ROWS = 10_000


def _idiv(a: Column, b: int) -> Column:
    """Exact integral division (SQL ``div``) on longs — NOT ``/``,
    which is IEEE double on integrals and can round a quotient across
    the integer boundary once operands exceed 2^26 (ADVICE r6)."""
    return F.call_function("div", a.cast("long"), F.lit(b).cast("long"))


def _is_float(dt: T.DataType) -> bool:
    return isinstance(dt, (T.FloatType, T.DoubleType))


def _probe_cuts(
    df: DataFrame, primary: str, descending: bool, n_buckets: int
) -> list:
    """Percentile cuts of ``primary`` as driver literals, enforcing
    the non-NULL / non-NaN contract in the SAME aggregate pass (a
    NULL primary would bucket to NULL and silently fall through the
    offset chain; enforcement costs nothing extra)."""
    dt = df.schema[primary].dataType
    probs = [i / n_buckets for i in range(1, n_buckets)]
    aggs = [
        F.percentile_approx(primary, probs, 10_000).alias("b"),
        F.sum(F.col(primary).isNull().cast("long")).alias("nulls"),
    ]
    if _is_float(dt):
        aggs.append(
            F.sum(F.isnan(F.coalesce(primary, F.lit(0.0))).cast("long"))
            .alias("nans")
        )
    row = df.agg(*aggs).head()
    if (row["nulls"] or 0) > 0:
        raise ValueError(
            f"boundary-cut rank: primary column {primary!r} has "
            f"{row['nulls']} NULLs — the total-order contract requires "
            "a non-null primary (filter or coalesce first)"
        )
    if _is_float(dt) and (row["nans"] or 0) > 0:
        raise ValueError(
            f"boundary-cut rank: primary column {primary!r} has "
            f"{row['nans']} NaNs — NaN ordering is engine-specific; "
            "filter or quantize first"
        )
    return sorted(set(row["b"] or []), reverse=descending)


def _cut_count_expr(col: Column, cuts: list, descending: bool) -> Column:
    """Count of cuts strictly below (above for DESC) the value — the
    order-preserving bucket id, a codegen'd literal comparison chain."""
    bucket = F.lit(0)
    for c in cuts:
        cond = (col > F.lit(c)) if not descending else (col < F.lit(c))
        bucket = bucket + cond.cast("int")
    return bucket


def _assign_buckets(
    df: DataFrame,
    primary: str,
    descending: bool,
    n_buckets: int,
    secondary: str | None,
    on_skew: str,
    agg_cols: Sequence[Column],
) -> tuple[DataFrame, list[list], int]:
    """df + ``__bkt`` (order-consistent, skew-split) and the per-bucket
    aggregate rows ``[bkt, count, *agg_cols]`` in bucket order, plus
    total row count.  Driver actions collect O(n_buckets) rows only.
    """
    if on_skew not in ("raise", "accept"):
        raise ValueError(f"on_skew must be 'raise' or 'accept': {on_skew!r}")
    cuts = _probe_cuts(df, primary, descending, n_buckets)
    pcol = F.col(primary)
    b_df = df.withColumn("__bkt", _cut_count_expr(pcol, cuts, descending))

    stats = (
        b_df.groupBy("__bkt")
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.min(primary).alias("__lo"),
            F.max(primary).alias("__hi"),
            *agg_cols,
        )
        .collect()
    )
    by_bucket = {r["__bkt"]: r for r in stats}
    if None in by_bucket:  # defensive; the probe guard should catch it
        raise ValueError(
            f"boundary-cut rank: NULL bucket for primary {primary!r}"
        )
    total = sum(r["__c"] for r in stats)

    def _rows(bucket_map: dict) -> list[list]:
        # normalized layout: [bkt, count, *agg values] (lo/hi dropped)
        out = []
        for b in sorted(bucket_map):
            vals = list(bucket_map[b])
            out.append(
                [vals[0], vals[1]] + vals[4:]
                if len(vals) >= 4 and "__lo" in bucket_map[b].__fields__
                else vals
            )
        return out

    fat_thresh = max(4 * total // max(n_buckets, 1), SKEW_FLOOR_ROWS)
    fat = [b for b, r in by_bucket.items() if r["__c"] > fat_thresh]
    if not fat:
        return b_df, _rows(by_bucket), total

    # --- tie-class auto-split -------------------------------------
    splittable = [b for b in fat if by_bucket[b]["__lo"] == by_bucket[b]["__hi"]]
    unsplit = [b for b in fat if b not in splittable]
    sec_ok = (
        secondary is not None
        and secondary in df.columns
        and not _is_float(df.schema[secondary].dataType)
    )
    if (unsplit or not sec_ok) and on_skew == "raise":
        detail = (
            f"fat buckets {sorted(fat)} (> {fat_thresh} rows of {total}); "
            f"tie-class-splittable: {sorted(splittable)}"
        )
        hint = (
            "pass a numeric non-null `secondary` order key to auto-split "
            "tie classes, raise n_buckets, or set on_skew='accept' with a "
            "documented bound on the tie-class mass"
        )
        raise ValueError(f"boundary-cut rank: skewed buckets — {detail}; {hint}")
    if not sec_ok or not splittable:
        return b_df, _rows(by_bucket), total

    # probe secondary percentiles WITHIN each fat tie class (one pass
    # filtered to the fat classes; O(n_fat × n_buckets) driver rows)
    fat_vals = [by_bucket[b]["__lo"] for b in splittable]
    sub_probs = [i / n_buckets for i in range(1, n_buckets)]
    sub_rows = (
        b_df.filter(pcol.isin(fat_vals))
        .groupBy(pcol.alias("__v"))
        .agg(
            F.percentile_approx(secondary, sub_probs, 10_000).alias("b"),
            F.sum(F.col(secondary).isNull().cast("long")).alias("nulls"),
        )
        .collect()
    )
    sub_cuts: dict = {}
    for r in sub_rows:
        if (r["nulls"] or 0) > 0:
            if on_skew == "raise":
                raise ValueError(
                    f"boundary-cut rank: secondary {secondary!r} has NULLs "
                    f"inside fat tie class {r['__v']!r} — cannot split"
                )
            continue
        sub_cuts[r["__v"]] = sorted(set(r["b"] or []))

    if not any(sub_cuts.values()):
        if on_skew == "raise" and not sub_cuts:
            raise ValueError(
                "boundary-cut rank: no fat tie class could be split on "
                f"secondary {secondary!r}"
            )
        return b_df, _rows(by_bucket), total

    # final bucket id: buckets renumbered so (old bucket, sub bucket)
    # stays consecutive and order-consistent; non-split buckets keep
    # one slot.  The id expression is a literal CASE-WHEN over the fat
    # primary values (bounded by n_fat), codegen-friendly.
    base_of: dict[int, int] = {}
    next_id = 0
    width: dict[int, int] = {}
    for b in sorted(by_bucket):
        base_of[b] = next_id
        v = by_bucket[b]["__lo"]
        w = len(sub_cuts[v]) + 1 if b in splittable and v in sub_cuts else 1
        width[b] = w
        next_id += w
    scol = F.col(secondary)
    bkt0 = _cut_count_expr(pcol, cuts, descending)
    # otherwise-accumulated when-chain over the original bucket id:
    # conditions are mutually exclusive, so evaluation order is free
    final: Column | None = None
    for b in sorted(by_bucket):
        v = by_bucket[b]["__lo"]
        if width[b] > 1:
            sub = F.lit(0)
            for c in sub_cuts[v]:
                sub = sub + (scol > F.lit(c)).cast("int")
            expr = F.lit(base_of[b]) + sub
        else:
            expr = F.lit(base_of[b])
        final = (
            expr if final is None
            else F.when(bkt0 == F.lit(b), expr).otherwise(final)
        )
    b_df = df.withColumn("__bkt", final.cast("int"))
    # recount on the final buckets (offsets must be exact)
    stats2 = (
        b_df.groupBy("__bkt")
        .agg(F.count(F.lit(1)).alias("__c"), *agg_cols)
        .collect()
    )
    by2 = {r["__bkt"]: r for r in stats2}
    return b_df, _rows(by2), total


def _offset_expr(ids: list[int], offsets: list) -> Column:
    """Literal CASE-WHEN chain mapping __bkt -> cumulative offset
    (codegen-friendly; see module docstring for why not element_at).
    Offsets are emitted as LONG (or exact Decimal) literals so the
    later ``local + offset`` add can never overflow int32 (ADVICE r6).
    """
    def lit(v):
        return F.lit(v).cast("long") if isinstance(v, int) else F.lit(v)

    off = lit(offsets[0])
    for i in range(1, len(ids)):
        off = F.when(F.col("__bkt") == ids[i], lit(offsets[i])).otherwise(off)
    return off


def with_global_row_number(
    df: DataFrame,
    order_by: Sequence[Column | str],
    primary: str,
    descending: bool = False,
    rn: str = "rn",
    n_buckets: int = DEFAULT_BUCKETS,
    secondary: str | None = None,
    on_skew: str = "raise",
    materialize: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """df + exact ``ROW_NUMBER() OVER (ORDER BY order_by)`` as ``rn``.

    ``order_by`` must be a total order whose first key is the numeric
    non-null column ``primary`` (direction given by ``descending``);
    ``order_by`` carries the full Column list including direction.
    ``secondary`` names the numeric second order key (always ASC) to
    enable tie-class auto-splitting under skew; ``materialize`` (e.g.
    a ``spill_final`` closure) cuts an expensive upstream lineage so
    the probe/counts/rank passes read a materialized table instead of
    recomputing it up to 3×.
    """
    out, _ = _global_row_number_with_total(
        df, order_by, primary, descending, rn, n_buckets,
        secondary=secondary, on_skew=on_skew, materialize=materialize,
    )
    return out


def _global_row_number_with_total(
    df: DataFrame,
    order_by: Sequence[Column | str],
    primary: str,
    descending: bool,
    rn: str,
    n_buckets: int,
    secondary: str | None = None,
    on_skew: str = "raise",
    materialize: Callable[[DataFrame], DataFrame] | None = None,
) -> tuple[DataFrame, int]:
    if materialize is not None:
        df = materialize(df)
    b_df, rows, total = _assign_buckets(
        df, primary, descending, n_buckets, secondary, on_skew, []
    )
    ids = [r[0] for r in rows]
    offsets, run = [], 0
    for r in rows:
        offsets.append(run)
        run += r[1]
    w_local = Window.partitionBy("__bkt").orderBy(*order_by)
    off = _offset_expr(ids, offsets)
    out = (
        b_df.withColumn("__lrn", F.row_number().over(w_local))
        .withColumn(rn, F.col("__lrn").cast("long") + off)
        .drop("__bkt", "__lrn")
    )
    return out, total


def with_global_running_sums(
    df: DataFrame,
    order_by: Sequence[Column | str],
    primary: str,
    value_cols: Sequence[str],
    aliases: Sequence[str],
    descending: bool = False,
    n_buckets: int = DEFAULT_BUCKETS,
    secondary: str | None = None,
    on_skew: str = "raise",
    materialize: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """df + exact ``SUM(value_col) OVER (ORDER BY order_by ROWS
    UNBOUNDED PRECEDING..CURRENT ROW)`` for EACH value col (one probe
    + one counts pass, shared buckets) — the parallel prefix-sum.

    Dtype contract: every value col must be an EXACT type — integral
    (released as long) or decimal (released as decimal(38, s)); float
    input raises, because per-bucket driver-collected partials would
    silently reorder float addition vs the window twin (ADVICE r6).
    Within groups tied on the whole ``order_by`` the local row order
    is engine-chosen, exactly as with the window form — released
    results must be tie-invariant in the same way.
    """
    if len(value_cols) != len(aliases):
        raise ValueError("value_cols and aliases must align")
    sum_aggs = []
    is_dec: list = []
    for vc in value_cols:
        dt = df.schema[vc].dataType
        if isinstance(dt, T.DecimalType):
            is_dec.append(T.DecimalType(38, dt.scale))
            sum_aggs.append(
                F.sum(vc).cast(f"decimal(38,{dt.scale})").alias(f"__s_{vc}")
            )
        elif isinstance(
            dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        ):
            is_dec.append(None)
            sum_aggs.append(F.sum(vc).cast("long").alias(f"__s_{vc}"))
        else:
            raise TypeError(
                f"with_global_running_sums: value col {vc!r} has "
                f"non-exact dtype {dt.simpleString()} — running sums "
                "are only bit-equal to the window form for integral/"
                "decimal values (quantize floats first)"
            )
    if materialize is not None:
        df = materialize(df)
    b_df, rows, _total = _assign_buckets(
        df, primary, descending, n_buckets, secondary, on_skew, sum_aggs
    )
    ids = [r[0] for r in rows]
    out = b_df
    for j, (vc, alias) in enumerate(zip(value_cols, aliases)):
        offsets: list = []
        run = 0 if is_dec[j] is None else __import__("decimal").Decimal(0)
        for r in rows:
            offsets.append(run)
            run = run + (r[2 + j] or 0)
        w_local = (
            Window.partitionBy("__bkt")
            .orderBy(*order_by)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        off = _offset_expr(ids, offsets)
        if is_dec[j] is None:
            val = F.sum(vc).over(w_local).cast("long") + off
        else:
            val = (
                F.sum(vc).over(w_local).cast(is_dec[j].simpleString())
                + off.cast(is_dec[j].simpleString())
            ).cast(is_dec[j].simpleString())
        out = out.withColumn(alias, val)
    return out.drop("__bkt")


def with_global_running_sum(
    df: DataFrame,
    order_by: Sequence[Column | str],
    primary: str,
    value_col: str,
    alias: str = "running",
    descending: bool = False,
    n_buckets: int = DEFAULT_BUCKETS,
    secondary: str | None = None,
    on_skew: str = "raise",
    materialize: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """Single-column convenience wrapper over
    :func:`with_global_running_sums` (same exact-dtype contract)."""
    return with_global_running_sums(
        df, order_by, primary, [value_col], [alias],
        descending=descending, n_buckets=n_buckets,
        secondary=secondary, on_skew=on_skew, materialize=materialize,
    )


def ntile_expr(rn: Column, n_total: int, k: int) -> Column:
    """SQL-standard ``NTILE(k)`` from a 1-based exact global row
    number and the total row count: the first ``N mod k`` buckets take
    ``ceil(N/k)`` rows, the rest ``floor(N/k)`` — pure INTEGER
    arithmetic (SQL ``div``, not a float quotient that can misround
    across a tile boundary once rows-per-tile exceeds 2^26 — ADVICE
    r6), bit-equal to the window function on any engine."""
    base, rem = divmod(int(n_total), k)
    thresh = rem * (base + 1)
    r = rn.cast("long")
    lo = _idiv(r - 1, base + 1) + 1
    hi = rem + _idiv(r - thresh - 1, max(base, 1)) + 1
    return F.when(r <= thresh, lo).otherwise(hi).cast("int")


def with_global_ntile(
    df: DataFrame,
    order_by: Sequence[Column | str],
    primary: str,
    k: int,
    descending: bool = False,
    alias: str = "bucket",
    n_buckets: int = DEFAULT_BUCKETS,
    secondary: str | None = None,
    on_skew: str = "raise",
    materialize: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """df + exact ``NTILE(k) OVER (ORDER BY order_by)`` as ``alias``,
    via the boundary-cut global row number (no single-partition
    window; the total count comes from the same O(n_buckets)
    counts collect)."""
    ranked, total = _global_row_number_with_total(
        df, order_by, primary, descending, "__grn", n_buckets,
        secondary=secondary, on_skew=on_skew, materialize=materialize,
    )
    return ranked.withColumn(
        alias, ntile_expr(F.col("__grn"), total, k)
    ).drop("__grn")
