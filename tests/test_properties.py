"""Property-based tests (hypothesis) for the core relational
invariants — randomized inputs catch edge shapes example tests miss."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakehouse_ecommerce_etl_pipeline_spark.operators.validate import (
    split_valid_invalid,
)
from lakehouse_ecommerce_etl_pipeline_spark.sinks.merge import merge_frames

_slow = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.text(alphabet="abcde", min_size=1, max_size=2)
rows = st.lists(st.tuples(keys, st.integers(-100, 100)), min_size=0, max_size=12)


@_slow
@given(target_rows=rows, source_rows=rows)
def test_merge_frames_properties(spark, target_rows, source_rows):
    # MERGE contract requires unique source keys (reference dedups first)
    source_rows = list({k: (k, v) for k, v in source_rows}.values())
    target_rows = list({k: (k, v) for k, v in target_rows}.values())
    target = spark.createDataFrame(target_rows or [("zz", 0)], "k string, v int")
    source = spark.createDataFrame(source_rows or [("zz", 1)], "k string, v int")
    out = {r.k: r.v for r in merge_frames(target, source, ["k"]).collect()}
    t = dict(target_rows or [("zz", 0)])
    s = dict(source_rows or [("zz", 1)])
    # property 1: key set = union
    assert set(out) == set(t) | set(s)
    # property 2: source wins on overlap, target preserved otherwise
    for k, v in out.items():
        assert v == (s[k] if k in s else t[k])


@_slow
@given(
    data=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 5)),
            st.one_of(st.none(), st.integers(0, 5)),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_split_valid_invalid_is_exact_partition(spark, data):
    df = spark.createDataFrame(data, "a int, b int")
    valid, invalid = split_valid_invalid(df, ["a", "b"])
    nv, ni = valid.count(), invalid.count()
    assert nv + ni == len(data)
    assert nv == sum(1 for a, b in data if a is not None and b is not None)
    assert valid.filter("a IS NULL OR b IS NULL").count() == 0


# ---------------------------------------------------------------- zorder

morton_coords = st.integers(0, 1023)


@_slow
@given(x=morton_coords, y=morton_coords, x2=morton_coords, y2=morton_coords)
def test_morton_code_bijective_and_locality(spark, x, y, x2, y2):
    from pyspark.sql import functions as F

    from lakehouse_ecommerce_etl_pipeline_spark.operators.zorder import (
        zvalue_column,
    )

    df = spark.createDataFrame([(x, y), (x2, y2)], "x long, y long")
    za, zb = [r[0] for r in df.select(zvalue_column("x", "y", 10)).collect()]
    # injective: distinct points never share a Z-value
    if (x, y) != (x2, y2):
        assert za != zb
    else:
        assert za == zb
    # range: 10+10 bits interleave into [0, 2^20)
    assert 0 <= za < (1 << 20) and 0 <= zb < (1 << 20)
    # containment: the top 2k bits of z identify the 2^(10-k) cell;
    # equal top-4 bits => both coords share their top-2 bits
    if za >> 16 == zb >> 16:
        assert x >> 8 == x2 >> 8 and y >> 8 == y2 >> 8


@_slow
@given(target_rows=rows, change_rows=rows, del_flags=st.lists(st.booleans(), max_size=12))
def test_apply_changes_frames_matches_dict_model(
    spark, target_rows, change_rows, del_flags
):
    from lakehouse_ecommerce_etl_pipeline_spark.sinks.merge import (
        apply_changes_frames,
    )

    # unique keys per batch (the MERGE source contract)
    target_rows = list({k: (k, v) for k, v in target_rows}.values())
    change_rows = list({k: (k, v) for k, v in change_rows}.values())
    changes = [
        (k, v, "delete" if (i < len(del_flags) and del_flags[i]) else "upsert")
        for i, (k, v) in enumerate(change_rows)
    ]
    target = spark.createDataFrame(
        target_rows or [("zz", 0)], "k string, v int"
    )
    source = spark.createDataFrame(
        changes or [("zz", 1, "upsert")], "k string, v int, op string"
    )
    out = {
        r.k: r.v
        for r in apply_changes_frames(target, source, ["k"]).collect()
    }
    # dict replay model
    model = dict(target_rows or [("zz", 0)])
    for k, v, op in changes or [("zz", 1, "upsert")]:
        if op == "delete":
            model.pop(k, None)
        else:
            model[k] = v
    assert out == model
