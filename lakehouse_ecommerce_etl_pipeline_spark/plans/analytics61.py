"""Analytics tier LXI: schema profiling — functional dependencies and
candidate keys.

The discovery side of data-contract management (the enforcement side
is q_dq_expectations): given candidate column pairs, measure whether
LHS -> RHS actually holds in the data, and whether candidate column
sets are unique. Both are the metadata a migration / dedup / MERGE
design needs before it can pick keys — the reference hard-codes its
MERGE keys (lakehouse-ecommerce-etl-pipeline glue_jobs/load_orders.py);
this tier derives them from evidence.

- **q_functional_deps** — for each candidate FD, count the LHS groups
  whose RHS is not single-valued.  Per candidate: one aggregation on
  (LHS, RHS) collapsed map-side to distinct pairs, then a per-LHS
  rollup — the shuffle carries distinct (LHS, RHS) pairs, never rows.
  100 TB: each candidate is an independent partial-agg pipeline over
  a column-pruned scan; candidates can share one scan via grouping
  sets if the candidate list grows.

- **q_candidate_keys** — uniqueness profile of candidate key sets in
  ONE scan per table: n_rows vs COUNT(DISTINCT struct(cols)).
  100 TB: count_distinct expands partial-aggregated; for wider audits
  swap in approx_count_distinct first and verify only the survivors
  exactly (the standard two-phase key-discovery trick).

All outputs are integer counts and booleans — bit-exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

# (table, LHS columns, RHS column) — mixed true/false on purpose so
# both verdict branches are exercised and value-checked
_FD_CANDIDATES: list[tuple[str, tuple[str, ...], str]] = [
    ("orders", ("o_orderkey",), "o_custkey"),
    ("orders", ("o_custkey",), "o_orderpriority"),
    ("lineitem", ("l_orderkey",), "l_suppkey"),
    ("lineitem", ("l_orderkey", "l_linenumber"), "l_partkey"),
    ("lineitem", ("l_partkey",), "l_suppkey"),
]

_KEY_CANDIDATES: list[tuple[str, tuple[str, ...]]] = [
    ("orders", ("o_orderkey",)),
    ("orders", ("o_custkey",)),
    ("lineitem", ("l_orderkey", "l_linenumber")),
    ("lineitem", ("l_orderkey", "l_partkey", "l_suppkey")),
    ("events", ("event_id",)),
]


def _fd_oracle() -> str:
    arms = []
    for table, lhs, rhs in _FD_CANDIDATES:
        lhs_csv = ", ".join(lhs)
        name = f"{table}:{'+'.join(lhs)}->{rhs}"
        arms.append(
            f"""
            SELECT '{name}' AS candidate,
                   CAST(COUNT(*) AS BIGINT) AS n_lhs_groups,
                   CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_violating_groups,
                   CAST(MAX(n_rhs) AS BIGINT) AS max_rhs_per_lhs,
                   (MAX(n_rhs) = 1) AS holds
            FROM (
              SELECT {lhs_csv}, COUNT(DISTINCT {rhs}) AS n_rhs
              FROM {table} GROUP BY {lhs_csv}
            )"""
        )
    return " UNION ALL ".join(arms)


@register("q_functional_deps", oracle=_fd_oracle())
def q_functional_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for table, lhs, rhs in _FD_CANDIDATES:
        name = f"{table}:{'+'.join(lhs)}->{rhs}"
        per_lhs = (
            load(spark, sf_dir, table)
            .groupBy(*lhs)
            .agg(F.count_distinct(F.col(rhs)).alias("n_rhs"))
        )
        one = per_lhs.agg(
            F.lit(name).alias("candidate"),
            F.count(F.lit(1)).cast("bigint").alias("n_lhs_groups"),
            F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating_groups"),
            F.max("n_rhs").cast("bigint").alias("max_rhs_per_lhs"),
            (F.max("n_rhs") == 1).alias("holds"),
        )
        out = one if out is None else out.unionByName(one)
    return out


def _keys_oracle() -> str:
    arms = []
    for table, cols in _KEY_CANDIDATES:
        cols_csv = ", ".join(cols)
        name = f"{table}:{'+'.join(cols)}"
        arms.append(
            f"""
            SELECT '{name}' AS candidate,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(DISTINCT ({cols_csv})) AS BIGINT) AS n_distinct,
                   (COUNT(*) = COUNT(DISTINCT ({cols_csv}))) AS is_key
            FROM {table}"""
        )
    return " UNION ALL ".join(arms)


@register("q_candidate_keys", oracle=_keys_oracle())
def q_candidate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for table, cols in _KEY_CANDIDATES:
        name = f"{table}:{'+'.join(cols)}"
        one = load(spark, sf_dir, table).agg(
            F.lit(name).alias("candidate"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_distinct(*[F.col(c) for c in cols])
            .cast("bigint")
            .alias("n_distinct"),
            (F.count(F.lit(1)) == F.count_distinct(*[F.col(c) for c in cols]))
            .alias("is_key"),
        )
        out = one if out is None else out.unionByName(one)
    return out
