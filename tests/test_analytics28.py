from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics28 import (
    q_checksum_table,
    q_normalize_embeddings,
    q_session_conversion_rate,
)

SF0001 = "/root/testdata/sf0.001"


def test_checksum_is_order_insensitive_and_change_sensitive(spark):
    base = q_checksum_table(spark, SF0001).collect()[0]
    again = q_checksum_table(spark, SF0001).collect()[0]
    assert base["checksum"] == again["checksum"]
    assert base["n_rows"] == load(spark, SF0001, "orders").count()
    # recompute in Python over rows in a DIFFERENT order: same digest
    rows = load(spark, SF0001, "orders").collect()
    import hashlib

    total = 0
    for r in sorted(rows, key=lambda x: x["o_totalprice"]):
        price = repr(r["o_totalprice"])
        # Python repr of floats IS the shortest roundtrip rendering,
        # but integers like 5.0 render '5.0' while engines say '5.0'
        line = "|".join(
            [
                str(r["o_orderkey"]),
                str(r["o_custkey"]),
                r["o_orderstatus"],
                price,
                r["o_orderdate"].strftime("%Y-%m-%d"),
                r["o_orderpriority"],
            ]
        )
        total += int(hashlib.md5(line.encode()).hexdigest()[:14], 16)
    assert int(base["checksum"]) == total


def test_session_conversion_rate_bounds_and_totals(spark):
    rows = q_session_conversion_rate(spark, SF0001).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_converted"] <= r["n_sessions"]
        assert abs(r["conversion_rate"] - r["n_converted"] / r["n_sessions"]) < 1e-15
    # sessions partition the event stream: total session count equals
    # the number of distinct (user, session) pairs from the sessionizer
    from lakehouse_ecommerce_etl_pipeline_spark.operators.windows import (
        sessionize,
    )

    ev = load(spark, SF0001, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    n_sessions = (
        sessionize(ev, "user_id", "ts", 1800, order_tiebreak=["event_id"])
        .select("user_id", "session_id")
        .distinct()
        .count()
    )
    assert sum(r["n_sessions"] for r in rows) == n_sessions


def test_normalized_dimensions_have_zero_mean_unit_var(spark):
    out = q_normalize_embeddings(spark, SF0001)
    stats = (
        out.groupBy("pos")
        .agg(
            F.avg("zval").alias("m"),
            F.avg(F.col("zval") * F.col("zval")).alias("m2"),
        )
        .collect()
    )
    emb_dim = len(
        load(spark, SF0001, "embeddings").select("embedding").first()[0]
    )
    assert len(stats) == emb_dim
    for r in stats:
        # moments were quantized to 6 decimals before the z-score, so
        # the float recompute agrees to ~1e-6, not machine epsilon
        assert abs(r["m"]) < 1e-6
        assert abs(r["m2"] - 1.0) < 1e-5
