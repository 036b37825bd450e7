"""Analytics tier XL: scale-technique query faces — bucketed
shuffle-free joins and salted skew-safe joins as registered,
value-oracled queries.

Both techniques already exist as operators with pytest equivalence
proofs (sinks/bucketing.py, operators/skew.py, tests/
test_scale_techniques.py); this tier registers them as corpus queries
so the correctness gate ALSO pins their results: the technique's
whole contract is "same answer, better physical plan", and the shared
DuckDB oracle is exactly that assertion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.operators.skew import salted_join
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register
from lakehouse_ecommerce_etl_pipeline_spark.sinks.bucketing import (
    write_bucketed,
)

_N_BUCKETS = 8


def bucketed_pair(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """(orders, customer) saved as co-bucketed tables on the customer
    key — the layout that makes every downstream join on that key
    shuffle-free.  Table names carry the sf tag so scale factors don't
    collide in the shared session catalog."""
    tag = sf_dir.rstrip("/").split("/")[-1].replace(".", "_")
    t_orders = f"orders_bq_{tag}"
    t_cust = f"customer_bq_{tag}"
    write_bucketed(
        load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        ),
        t_orders,
        ["o_custkey"],
        _N_BUCKETS,
        sort_by=["o_custkey"],
    )
    write_bucketed(
        load(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        ),
        t_cust,
        ["c_custkey"],
        _N_BUCKETS,
        sort_by=["c_custkey"],
    )
    return t_orders, t_cust


@register(
    "q_bucket_join_no_shuffle",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q_bucket_join_no_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: orders and customer are saved
    bucketed (and sorted) on the customer key with matching bucket
    counts, then joined — the catalog's bucket metadata lets the
    sort-merge join read both sides pre-partitioned, with NO exchange
    on either side (tests/test_scale_techniques.py asserts the
    shuffle-free plan; this query pins the values).

    100 TB: this is the single biggest repeated-join win there is —
    bucket once at write time, and every downstream fact⋈dim or
    fact⋈fact on that key skips both shuffles forever.  The knobs:
    bucket count ≈ target parallelism at the LARGEST consumer's
    scale, and identical bucketing (count + key) on both sides, or
    Spark falls back to shuffling the mismatched side."""
    t_orders, t_cust = bucketed_pair(spark, sf_dir)
    o = spark.table(t_orders)
    c = spark.table(t_cust)
    return o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        "o_orderkey", "o_custkey", "c_mktsegment", "o_totalprice"
    )


@register(
    "q_salted_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice,
           o.o_orderpriority
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted join: the fact side gets a random salt in
    [0, 16), the dim side is replicated across all 16 salt values, and
    the join runs on (key, salt) — a hot key's rows spread over 16
    reducers instead of melting one.  The salt column never escapes,
    so the result is EXACTLY the plain join, which the oracle asserts
    (the pytest twin proves it row-for-row on a synthetic hot key).

    100 TB: salting is the manual fallback when AQE's skew-join split
    can't help (e.g. the skew is in the build of a bucketed join, or
    a stable plan is required); cost = dim side replicated ×16 —
    right when the dim is small and a key is pathological, wrong
    otherwise.  Prefer AQE (on in this engine's session) first."""
    fact = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("jk"),
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
    )
    dim = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("jk"), "o_orderpriority"
    )
    return salted_join(fact, dim, "jk", salt_buckets=16).select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "o_orderpriority"
    )
