from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.operators.rules import (
    apply_rules,
    positive_amount_rule,
    timestamp_range_rule,
    zscore_outliers,
)


def test_apply_rules_first_violation_wins(spark):
    df = spark.createDataFrame(
        [
            ("ok", "2024-06-01 00:00:00", 10.0),
            ("old", "1990-01-01 00:00:00", 10.0),
            ("neg", "2024-06-01 00:00:00", -5.0),
            ("both", "1990-01-01 00:00:00", -5.0),
            ("null_amt", "2024-06-01 00:00:00", None),
        ],
        "tag string, ts string, amount double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rules = [
        timestamp_range_rule("ts", "2000-01-01 00:00:00", "2030-01-01 00:00:00"),
        positive_amount_rule("amount"),
    ]
    valid, invalid = apply_rules(df, rules)
    assert [r.tag for r in valid.collect()] == ["ok"]
    reasons = {r.tag: r.rejection_reason for r in invalid.collect()}
    assert reasons["old"].startswith("ts outside")
    assert reasons["neg"] == "amount not positive"
    assert reasons["both"].startswith("ts outside")  # first rule wins
    assert reasons["null_amt"] == "amount not positive"  # NULL → violation


def test_zscore_outliers_flags_extreme(spark):
    rows = [("u1", float(v)) for v in [10, 11, 9, 10, 12, 10, 11, 1000]]
    rows += [("u2", 5.0)]  # singleton group → NULL zscore, no error
    df = spark.createDataFrame(rows, "user string, amount double")
    out = zscore_outliers(df, "amount", ["user"], z_threshold=2.0)
    flagged = [r.amount for r in out.filter("is_outlier").collect()]
    assert flagged == [1000.0]
    singleton = out.filter(F.col("user") == "u2").collect()[0]
    assert singleton.zscore is None and singleton.is_outlier is None
