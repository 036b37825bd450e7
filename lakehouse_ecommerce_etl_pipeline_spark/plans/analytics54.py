"""Analytics tier LIV: keyed pseudonymization (format-preserving
Feistel permutation).

q_mask_pii (analytics14) REDACTS; GDPR erasure (analytics44) DELETES.
The third privacy primitive a training pipeline needs is keyed
PSEUDONYMIZATION: replace every customer id with a deterministic
pseudonym that (a) never collides (bijection), (b) preserves
joinability and per-user statistics across tables and runs, and
(c) is invertible with the key for authorized re-identification.
functions/fpe.py implements it as a 4-round balanced Feistel network
over the 48-bit key space — the NIST FF1/FF3 construction shape —
with an md5 round function both engines can evaluate, so the oracle
value-checks every pseudonym digit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.functions.fpe import (
    pseudonymize48,
    pseudonymize48_sql,
)
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register


@register(
    "q_pseudonymize_keys",
    oracle=f"""
    SELECT o_orderkey,
           CAST({pseudonymize48_sql('o_custkey')} AS BIGINT)
             AS pseudo_custkey
    FROM orders
    """,
)
def q_pseudonymize_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replace o_custkey with its Feistel pseudonym on every order
    row. Same customer ⇒ same pseudonym (grouping/joining still
    works); different customers can never collide (permutation);
    nothing about the original id is inferable without the tweak.

    100 TB: pure in-row projection — four md5+xor rounds inside
    whole-stage codegen, zero shuffles, zero UDFs; pseudonymizing a
    petabyte is a map-only pass."""
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        pseudonymize48(F.col("o_custkey")).alias("pseudo_custkey"),
    )
