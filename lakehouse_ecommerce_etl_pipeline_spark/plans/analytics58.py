"""Tier LVIII: differentially-private count release — the seeded
discrete geometric (two-sided) mechanism, all-integer and therefore
fully value-oracled.

Completes the privacy family: redaction (q_mask_pii), keyed
pseudonymization (q_pseudonymize_keys), erasure audit
(q_gdpr_erasure_audit), k-anonymity report (q_k_anonymity) — and now
NOISE: the published-statistics face, where per-group counts are
released with discrete Laplace noise so no single row's presence is
identifiable from the release.

Mechanism (Ghosh-Roughgarden-Sundararajan's geometric mechanism):
noise = G1 - G2 with G1, G2 iid Geometric(1/2), giving the two-sided
geometric distribution P(k) proportional to (1/2)^|k| — the discrete
Laplace with eps = ln 2 for a count query of sensitivity 1. A
Geometric(1/2) draw is EXACTLY the trailing-zero count of a uniform
random integer (each lower bit is an independent fair coin), so with
md5-derived int48s as the uniform source the whole mechanism is
integer bit-twiddling:

    tz(h) = bit_count((h & -h) - 1)        (capped at 48 for h = 0)
    noise = tz(h1) - tz(h2)

Seeded, not secret, randomness — deterministic replay is what makes
the release testable (and is how production DP systems run audits);
a real deployment swaps the seed for a vaulted one without touching
the plan. Noisy counts are clamped at 0 (counts are non-negative;
post-processing never hurts DP guarantees).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


def _tz_spark(col: str) -> str:
    """Trailing-zero count of a positive int48 (SQL expr string)."""
    return f"bit_count(({col} & -{col}) - 1)"


def _geom_noise_spark(key: str, salt: str) -> str:
    """One Geometric(1/2) draw from md5(salt || key)."""
    h = f"CAST(conv(substring(md5(concat('{salt}', {key})), 1, 12), 16, 10) AS BIGINT)"
    return f"LEAST({_tz_spark(f'({h})')}, 48)"


@register(
    "q_dp_noisy_counts",
    oracle="""
    WITH grp AS (
      SELECT n.n_name AS nation, o.o_orderpriority AS priority,
             COUNT(*) AS true_count
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name, o.o_orderpriority
    ),
    draws AS (
      SELECT nation, priority, true_count,
             CAST('0x' || substr(md5('dp-g1:' || nation || '|' || priority),
                  1, 12) AS BIGINT) AS h1,
             CAST('0x' || substr(md5('dp-g2:' || nation || '|' || priority),
                  1, 12) AS BIGINT) AS h2
      FROM grp
    ),
    noise AS (
      SELECT nation, priority, true_count,
             LEAST(bit_count((h1 & -h1) - 1), 48)
               - LEAST(bit_count((h2 & -h2) - 1), 48) AS eps_noise
      FROM draws
    )
    SELECT nation, priority,
           CAST(eps_noise AS INTEGER) AS noise,
           CAST(GREATEST(true_count + eps_noise, 0) AS BIGINT)
             AS noisy_count
    FROM noise
    """,
)
def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP-style release of the (nation x order-priority) count table:
    exact group counts plus seeded discrete-Laplace noise (eps = ln 2,
    sensitivity 1), clamped at zero. The noise column is released too
    ONLY because the seed is public test randomness — a production
    release drops it and vaults the seed.

    Full value oracle: both engines derive the identical int48s from
    md5 of the group key and run the identical trailing-zero
    arithmetic — no floats, no engine RNG.

    100 TB: the aggregate is the ordinary partial-aggregated count
    (one shuffle on the group key after the customer equi-join and the
    broadcast nation dim); the
    mechanism itself is a free in-row projection on the group-grain
    result — DP releases cost exactly what the underlying counts
    cost."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    grp = (
        orders.join(
            # customer is fact-sized at scale: equi-join, AQE decides
            customer.select("c_custkey", "c_nationkey"),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count("*").alias("true_count"))
    )
    key = "concat(nation, '|', priority)"
    noise = (
        f"({_geom_noise_spark(key, 'dp-g1:')})"
        f" - ({_geom_noise_spark(key, 'dp-g2:')})"
    )
    return grp.select(
        "nation",
        "priority",
        F.expr(noise).cast("int").alias("noise"),
        F.expr(f"GREATEST(true_count + ({noise}), 0L)")
        .cast("long")
        .alias("noisy_count"),
    )
