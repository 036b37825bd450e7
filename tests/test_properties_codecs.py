"""Property-based tests for the round's codec layers: Avro binary
encoding + container framing (pure Python — no Spark needed) and the
Feistel pseudonymization network (Spark columns)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakehouse_ecommerce_etl_pipeline_spark.sources.avro import (
    parse_ocf,
    read_long,
    write_long,
    write_ocf,
)

_fast = settings(max_examples=200, deadline=None)
_spark_slow = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_fast
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_varint_round_trip(n):
    buf = write_long(n)
    got, pos = read_long(memoryview(buf), 0)
    assert got == n and pos == len(buf)


_FIELDS = [
    ("id", "long"),
    ("name", "string"),
    ("score", ["null", "double"]),
    ("ok", "boolean"),
    ("blob", "bytes"),
]

_rows = st.lists(
    st.tuples(
        st.integers(min_value=-(2**62), max_value=2**62),
        st.text(max_size=40),
        st.one_of(st.none(), st.floats(allow_nan=False)),
        st.booleans(),
        st.binary(max_size=40),
    ),
    max_size=25,
)


@settings(max_examples=60, deadline=None)
@given(rows=_rows, codec=st.sampled_from(["null", "deflate"]),
       per_block=st.integers(min_value=1, max_value=7))
def test_ocf_round_trip_property(rows, codec, per_block):
    blob = write_ocf(rows, _FIELDS, file_id=1, codec=codec,
                     records_per_block=per_block)
    records, fields = parse_ocf(blob)
    assert fields == _FIELDS
    got = [tuple(r[n] for n, _ in _FIELDS) for r in records]
    assert got == rows


@_spark_slow
@given(st.lists(st.integers(min_value=0, max_value=2**48 - 1),
                min_size=1, max_size=30, unique=True))
def test_fpe_round_trip_property(spark, keys):
    from pyspark.sql import functions as F

    from lakehouse_ecommerce_etl_pipeline_spark.functions.fpe import (
        depseudonymize48,
        pseudonymize48,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    out = df.select(
        "k",
        pseudonymize48(F.col("k")).alias("p"),
        depseudonymize48(pseudonymize48(F.col("k"))).alias("back"),
    ).collect()
    assert all(r["back"] == r["k"] for r in out)
    assert all(0 <= r["p"] < (1 << 48) for r in out)
    assert len({r["p"] for r in out}) == len(keys)  # injective
