from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.operators.dedup import (
    dedup_arbitrary,
    dedup_deterministic,
)
from lakehouse_ecommerce_etl_pipeline_spark.operators.joins import (
    anti_join,
    fk_violations,
    referential_filter,
    semi_join,
)
from lakehouse_ecommerce_etl_pipeline_spark.operators.setops import (
    except_distinct,
    union_all,
)
from lakehouse_ecommerce_etl_pipeline_spark.operators.validate import (
    split_valid_invalid,
)
from lakehouse_ecommerce_etl_pipeline_spark.operators.windows import (
    sessionize,
    top_k_per_group,
)
from lakehouse_ecommerce_etl_pipeline_spark.functions.strings import (
    basename,
    is_ingestible_path,
    path_segment,
)


def test_split_valid_invalid_partitions_exactly(spark):
    df = spark.createDataFrame(
        [("a", 1), (None, 2), ("c", None), (None, None)], "k string, v int"
    )
    valid, invalid = split_valid_invalid(df, ["k", "v"])
    assert valid.count() == 1
    assert invalid.count() == 3
    assert valid.union(invalid).count() == df.count()


def test_dedup_arbitrary_keeps_one_per_key(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 1)], "k string, v int")
    assert dedup_arbitrary(df, ["k"]).count() == 2


def test_dedup_deterministic_keeps_first_by_order(spark):
    df = spark.createDataFrame([("a", 2), ("a", 1), ("b", 5)], "k string, v int")
    rows = {r.k: r.v for r in dedup_deterministic(df, ["k"], ["v"]).collect()}
    assert rows == {"a": 1, "b": 5}


def test_semi_anti_join_partition(spark):
    facts = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "k int, v string")
    dim = spark.createDataFrame([(1,), (3,)], "k int")
    assert {r.k for r in semi_join(facts, dim, "k").collect()} == {1, 3}
    assert {r.k for r in anti_join(facts, dim, "k").collect()} == {2}


def test_referential_filter_and_violations(spark):
    items = spark.createDataFrame(
        [("i1", "o1", "p1"), ("i2", "o9", "p1"), ("i3", "o1", "p9")],
        "id string, order_id string, product_id string",
    )
    orders = spark.createDataFrame([("o1",)], "order_id string")
    products = spark.createDataFrame([("p1",)], "product_id string")
    fks = {"order_id": (orders, "order_id"), "product_id": (products, "product_id")}
    assert [r.id for r in referential_filter(items, fks).collect()] == ["i1"]
    bad = {(r.id, r.fk_violation) for r in fk_violations(items, fks).collect()}
    assert bad == {("i2", "order_id"), ("i3", "product_id")}


def test_except_distinct_matches_reference_subtract(spark):
    a = spark.createDataFrame([(1,), (1,), (2,)], "v int")
    b = spark.createDataFrame([(2,)], "v int")
    assert [r.v for r in except_distinct(a, b).collect()] == [1]  # DISTINCT semantics


def test_union_all_by_name_handles_column_order(spark):
    a = spark.createDataFrame([(1, "x")], "k int, v string")
    b = spark.createDataFrame([("y", 2)], "v string, k int")
    rows = {(r.k, r.v) for r in union_all(a, b).collect()}
    assert rows == {(1, "x"), (2, "y")}


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("g1", 1), ("g1", 2), ("g1", 3), ("g2", 9)], "g string, v int"
    )
    out = top_k_per_group(df, ["g"], [F.col("v").desc()], 2)
    got = sorted((r.g, r.v) for r in out.collect())
    assert got == [("g1", 2), ("g1", 3), ("g2", 9)]


def test_sessionize_gap_boundaries(spark):
    df = spark.createDataFrame(
        [
            ("u1", 1, "2024-01-01 00:00:00"),
            ("u1", 2, "2024-01-01 00:10:00"),
            ("u1", 3, "2024-01-01 01:10:00"),  # > 30 min gap → new session
        ],
        "user_id string, event_id int, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.event_id: r.session_id for r in
           sessionize(df, "user_id", "ts", 1800, ["event_id"]).collect()}
    assert out == {1: 1, 2: 1, 3: 2}


def test_routing_predicate_and_path_functions(spark):
    df = spark.createDataFrame(
        [("raw/orders/a.csv",), ("raw/orders/b.xlsx",), ("tmp/x.csv",), ("raw/n.txt",)],
        "path string",
    )
    kept = df.filter(is_ingestible_path("path"))
    assert kept.count() == 2
    seg = kept.select(path_segment("path", 1).alias("ds"), basename("path").alias("f"))
    assert {(r.ds, r.f) for r in seg.collect()} == {
        ("orders", "a.csv"),
        ("orders", "b.xlsx"),
    }


def test_asof_join_pandas_matches_window_variant(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.operators.joins import (
        asof_join,
        asof_join_pandas,
    )
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 5), (2, 7), (3, 50)], "k int, t long"
    ).withColumn("t", F.timestamp_seconds("t"))
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 200.0), (2, 9, 300.0)], "k int, t long, v double"
    ).withColumn("t", F.timestamp_seconds("t"))

    a = sorted(map(tuple, asof_join(left, right, "k", "t", "t", ["v"]).collect()))
    b = sorted(map(tuple, asof_join_pandas(left, right, "k", "t", "t", ["v"]).collect()))
    assert a == b
    by_key_t = {(r[0], r[1].second): r[2] for r in a}
    assert by_key_t[(1, 10)] == 100.0   # latest at-or-before
    assert by_key_t[(1, 20)] == 200.0
    assert by_key_t[(1, 5)] is None     # nothing before
    assert by_key_t[(2, 7)] is None     # right exists but later
    assert by_key_t[(3, 50)] is None    # key absent from right


def test_asof_join_null_keys_follow_sql_equality(spark):
    """Null join keys match nothing in BOTH physical variants (SQL
    equality, the ASOF-JOIN by-clause contract) — a null-key left row
    survives with null value columns even when the right side also has
    null-key rows, and both variants agree (ADVICE r4)."""
    from lakehouse_ecommerce_etl_pipeline_spark.operators.joins import (
        asof_join,
        asof_join_pandas,
    )

    left = spark.createDataFrame(
        [(1, 10), (None, 10), (None, 20), (2, 10)], "k int, t long"
    ).withColumn("t", F.timestamp_seconds("t"))
    right = spark.createDataFrame(
        [(1, 5, 100.0), (None, 5, 999.0), (None, 15, 888.0)],
        "k int, t long, v double",
    ).withColumn("t", F.timestamp_seconds("t"))

    for impl in (asof_join, asof_join_pandas):
        rows = sorted(
            ((r[0], r[1].second, r[2]) for r in
             impl(left, right, "k", "t", "t", ["v"]).collect()),
            key=lambda x: (x[0] is None, x),
        )
        assert rows == [
            (1, 10, 100.0),
            (2, 10, None),      # key absent from right
            (None, 10, None),   # null key: never matches null-key right
            (None, 20, None),
        ], impl.__name__


def test_tree_rollup_restores_recursion_row_limit(spark):
    """q_tree_rollup must not leak its 200M recursion guard into the
    shared session (ADVICE r4): prior conf value is restored after the
    eager materialization, and the result is still correct."""
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics50 import (
        q_tree_rollup,
    )

    sf_dir = "/root/testdata/sf0.001"
    key = "spark.sql.cteRecursionRowLimit"
    prior = spark.conf.get(key, None)
    out = q_tree_rollup(spark, sf_dir)
    assert spark.conf.get(key, None) == prior
    root = {r.p_partkey: r.subtree_size for r in out.collect()}
    assert root and root[1] == max(root.values())  # root sees every node
    # a second run under a user-set prior value restores THAT value
    spark.conf.set(key, "123456")
    q_tree_rollup(spark, sf_dir)
    assert spark.conf.get(key) == "123456"
    spark.conf.unset(key)


def test_asof_join_pandas_survives_downstream_column_pruning(spark):
    """Spark 4 prunes each cogroup side independently to ZERO-COLUMN
    frames when downstream references none of its contributions:
    df.count() prunes the right side (and may prune both).  The merge
    UDF must normalize pruned inputs instead of KeyError-ing on the
    key column (r10 full-registry .count() scan caught this), and a
    left-columns-only projection must still see REAL left values."""
    from pyspark.sql import functions as F

    from lakehouse_ecommerce_etl_pipeline_spark.operators.joins import (
        asof_join_pandas,
    )

    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 5), (2, 7), (3, 50)], "k int, t long"
    ).withColumn("t", F.timestamp_seconds("t"))
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 200.0), (2, 9, 300.0)],
        "k int, t long, v double",
    ).withColumn("t", F.timestamp_seconds("t"))

    out = asof_join_pandas(left, right, "k", "t", "t", ["v"])
    assert out.count() == 5  # full pruning: row count only
    # right side pruned, left columns must be real
    ks = sorted(r.k for r in out.select("k").collect())
    assert ks == [1, 1, 1, 2, 3]
    # and the unpruned path still returns the true asof values
    by = {(r[0], r[1].second): r[2] for r in out.collect()}
    assert by[(1, 10)] == 100.0 and by[(1, 20)] == 200.0
    assert by[(3, 50)] is None
