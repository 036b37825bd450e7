"""Rule-based row validation + derived-column enrichment + anomaly
flagging — the reference's documented-but-absent operators
(SURVEY.md §2.13): timestamp-range validation
(docs/full_implementation_guide.md:142), amount-positivity (:143),
derived enrichment (:152), anomaly detection on ordering behavior
(:153). All pure Column expressions — codegen'd, no UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Moment sums ride the BIGINT integer-cents lattice (DESIGN §21
# rule 3): the value column must be 2-dp-valued (all money/measure
# doubles in the driver testdata are), so ROUND(v*100) is exact and
# the int64 sums are associative and engine-build-portable.


@dataclass
class Rule:
    """A named validation predicate; rows failing it are rejected with
    ``reason``."""

    name: str
    predicate: Column
    reason: str


def timestamp_range_rule(col: str, lo: str, hi: str) -> Rule:
    """docs:142 — timestamps must fall in a sane range."""
    return Rule(
        f"{col}_in_range",
        F.col(col).between(F.lit(lo).cast("timestamp"), F.lit(hi).cast("timestamp")),
        f"{col} outside [{lo}, {hi}]",
    )


def positive_amount_rule(col: str) -> Rule:
    """docs:143 — amounts must be strictly positive."""
    return Rule(f"{col}_positive", F.col(col) > 0, f"{col} not positive")


def apply_rules(df: DataFrame, rules: list[Rule]) -> tuple[DataFrame, DataFrame]:
    """(valid, invalid) — invalid rows carry ``rejection_reason`` of the
    FIRST violated rule (evaluation order = list order). NULL predicate
    results count as violations (ANSI three-valued logic folded to
    reject)."""
    all_ok = None
    reason = F.lit(None).cast("string")
    # build reason as reverse-priority coalesce: earlier rules win
    for rule in reversed(rules):
        failed = ~F.coalesce(rule.predicate, F.lit(False))
        reason = F.when(failed, F.lit(rule.reason)).otherwise(reason)
    for rule in rules:
        ok = F.coalesce(rule.predicate, F.lit(False))
        all_ok = ok if all_ok is None else (all_ok & ok)
    valid = df.filter(all_ok)
    invalid = df.filter(~all_ok).withColumn("rejection_reason", reason)
    return valid, invalid


def with_derived(df: DataFrame, derived: dict[str, Column]) -> DataFrame:
    """docs:152 — enrichment columns (e.g. order_item_total)."""
    for name, col in derived.items():
        df = df.withColumn(name, col)
    return df


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    partition_by: list[str],
    z_threshold: float = 3.0,
) -> DataFrame:
    """docs:153 — anomaly detection on ordering behavior: flag rows
    whose value deviates > z_threshold sample standard deviations from
    their group mean.

    Moments computed from exact integer-cents sums (engine-portable,
    DESIGN §21 rule 3: Σc is exact int64 per group; Σc² accumulates on
    decimal(38,0) — like q_chi2_independence's quadratic terms — so a
    group big enough to exceed 2^63 raises/NULLs instead of silently
    wrapping the way a BIGINT sum would in non-ANSI Spark while the
    DuckDB oracle's SUM(BIGINT) promotes to exact HUGEINT (r11 ADVICE
    item 2).  Every downstream step is the same IEEE double op on both
    engines; value_col must be 2-dp-valued. One aggregate + one
    broadcastable join back; no window sort needed.
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    sums = df.groupBy(*partition_by).agg(
        F.count(value_col).alias("__n"),
        (F.sum(cents).cast("double") / F.lit(100.0)).alias("__s"),
        (
            F.sum(
                cents.cast("decimal(19,0)") * cents.cast("decimal(19,0)")
            ).cast("double")
            / F.lit(10000.0)
        ).alias("__ss"),
    )
    stats = sums.select(
        *partition_by,
        (F.col("__s") / F.col("__n")).alias("__mean"),
        # ANSI mode errors on /0: groups of one row (or zero variance)
        # get NULL std → NULL zscore, not an exception
        F.when(
            F.col("__n") > 1,
            F.sqrt(
                F.try_divide(
                    F.col("__ss") - F.col("__s") * F.col("__s") / F.col("__n"),
                    (F.col("__n") - 1).cast("double"),
                )
            ),
        ).alias("__std"),
    )
    joined = df.join(F.broadcast(stats), partition_by)
    z = F.try_divide(F.col(value_col) - F.col("__mean"), F.col("__std"))
    return joined.select(
        *df.columns,
        F.round(z, 6).alias("zscore"),
        (F.abs(z) > z_threshold).alias("is_outlier"),
    )
