"""Boundary-cut exact global ranks (operators/ranks.py): the five
de-weaked production plans pinned value-equal to their NTILE /
ROW_NUMBER window twins, plus helper-level properties."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.operators.ranks import (
    with_global_ntile,
    with_global_row_number,
)

SF0001 = "/root/testdata/sf0.001"


def _assert_df_equal(a, b):
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_global_row_number_matches_window(spark):
    df = spark.read.parquet(f"{SF0001}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    got = with_global_row_number(
        df, ["o_totalprice", "o_orderkey"], primary="o_totalprice", rn="rn"
    ).select("o_orderkey", "rn")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    want = df.select(
        "o_orderkey", F.row_number().over(w).cast("long").alias("rn")
    )
    _assert_df_equal(got, want)


def test_global_row_number_descending_and_ties(spark):
    # heavy ties on the primary (mod 7) exercise the strictly-beyond
    # bucket rule and the tiebreak ordering, DESC direction
    df = (
        spark.range(0, 5000)
        .select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        )
    )
    got = with_global_row_number(
        df,
        [F.col("v").desc(), "k"],
        primary="v",
        descending=True,
        rn="rn",
        n_buckets=16,
    ).select("k", "rn")
    w = Window.orderBy(F.col("v").desc(), "k")
    want = df.select("k", F.row_number().over(w).cast("long").alias("rn"))
    _assert_df_equal(got, want)


@pytest.mark.parametrize("k,n", [(3, 5000), (10, 4999), (7, 7), (4, 3)])
def test_global_ntile_matches_window_all_remainders(spark, k, n):
    df = spark.range(0, n).select(
        F.col("id").alias("key"), ((F.col("id") * 37) % 101).alias("v")
    )
    got = with_global_ntile(
        df, ["v", "key"], primary="v", k=k, alias="b", n_buckets=8
    ).select("key", "b")
    w = Window.orderBy("v", "key")
    want = df.select("key", F.ntile(k).over(w).alias("b"))
    _assert_df_equal(got, want)


def test_global_rank_hypothesis_fuzz(spark):
    """Property fuzz: arbitrary multisets (heavy ties, negatives,
    tiny/degenerate sizes), random k and direction — boundary-cut
    ranks and ntiles must equal the window forms exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        vals=st.lists(
            st.integers(min_value=-50, max_value=50),
            min_size=1,
            max_size=300,
        ),
        k=st.integers(min_value=1, max_value=9),
        descending=st.booleans(),
        n_buckets=st.sampled_from([2, 5, 16]),
    )
    def check(vals, k, descending, n_buckets):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "key long, v long"
        )
        order = [F.col("v").desc() if descending else F.col("v"), "key"]
        got = with_global_ntile(
            df, order, primary="v", k=k, descending=descending,
            alias="b", n_buckets=n_buckets,
        ).select("key", "b")
        w = Window.orderBy(*order)
        want = df.select("key", F.ntile(k).over(w).alias("b"))
        _assert_df_equal(got, want)

        got_rn = with_global_row_number(
            df, order, primary="v", descending=descending,
            rn="rn", n_buckets=n_buckets,
        ).select("key", "rn")
        want_rn = df.select(
            "key", F.row_number().over(w).cast("long").alias("rn")
        )
        _assert_df_equal(got_rn, want_rn)

    check()


def test_five_deweaked_plans_equal_window_twins(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics14 import (
        q_histogram_equidepth,
        q_histogram_equidepth_window_form,
    )
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics33 import (
        q_quartile_contingency,
        q_quartile_contingency_window_form,
    )
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics46 import (
        q_calibration_deciles,
        q_calibration_deciles_window_form,
    )
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics48 import (
        q_systematic_sample,
        q_systematic_sample_window_form,
    )
    from lakehouse_ecommerce_etl_pipeline_spark.plans.llm29 import (
        q_ccnet_quality_buckets,
        q_ccnet_quality_buckets_window_form,
    )

    pairs = [
        (q_histogram_equidepth, q_histogram_equidepth_window_form),
        (q_calibration_deciles, q_calibration_deciles_window_form),
        (q_quartile_contingency, q_quartile_contingency_window_form),
        (q_systematic_sample, q_systematic_sample_window_form),
        (q_ccnet_quality_buckets, q_ccnet_quality_buckets_window_form),
    ]
    for prod, twin in pairs:
        _assert_df_equal(prod(spark, SF0001), twin(spark, SF0001))


def test_straggler_plans_equal_window_twins(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics15 import (
        q_rfm_segments,
        q_rfm_segments_window_form,
    )
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics22 import (
        q_concurrency_sweep,
        q_concurrency_sweep_window_form,
    )
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics36 import (
        q_shard_assignment_balanced,
        q_shard_assignment_balanced_window_form,
    )

    pairs = [
        (q_rfm_segments, q_rfm_segments_window_form),
        (q_shard_assignment_balanced, q_shard_assignment_balanced_window_form),
        (q_concurrency_sweep, q_concurrency_sweep_window_form),
    ]
    for prod, twin in pairs:
        _assert_df_equal(prod(spark, SF0001), twin(spark, SF0001))


def test_null_and_nan_primary_raise(spark):
    """The total-order contract (non-null, non-NaN primary) is now a
    guard, not a docstring: both violations fail fast (ADVICE r6)."""
    nulls = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0)], "k long, v double"
    )
    with pytest.raises(ValueError, match="NULL"):
        with_global_row_number(nulls, ["v", "k"], primary="v").collect()
    nans = spark.createDataFrame(
        [(1, 1.0), (2, float("nan")), (3, 3.0)], "k long, v double"
    )
    with pytest.raises(ValueError, match="NaN"):
        with_global_row_number(nans, ["v", "k"], primary="v").collect()


def test_running_sum_float_value_raises(spark):
    """Float value columns would silently reorder addition vs the
    window twin — the exact-dtype contract raises instead (ADVICE r6)."""
    from lakehouse_ecommerce_etl_pipeline_spark.operators.ranks import (
        with_global_running_sum,
    )

    df = spark.createDataFrame([(1, 0.5)], "t long, d double")
    with pytest.raises(TypeError, match="non-exact dtype"):
        with_global_running_sum(df, ["t"], primary="t", value_col="d")


def test_tie_class_auto_split(spark, monkeypatch):
    """Near-constant primary: the skew guard detects the fat tie
    classes; with a numeric secondary they are split by secondary
    cuts (bit-equal ranks, more balanced buckets); without one the
    helper raises instead of silently producing one fat bucket."""
    import lakehouse_ecommerce_etl_pipeline_spark.operators.ranks as ranks

    monkeypatch.setattr(ranks, "SKEW_FLOOR_ROWS", 10)
    df = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("v")
    )
    w = Window.orderBy("v", "k")
    want = df.select("k", F.row_number().over(w).cast("long").alias("rn"))

    got = ranks.with_global_row_number(
        df, ["v", "k"], primary="v", rn="rn", n_buckets=16, secondary="k"
    ).select("k", "rn")
    _assert_df_equal(got, want)

    # the split genuinely engaged: final buckets far exceed the 2
    # tie classes, and no bucket holds a constant fraction of rows
    b_df, rows, total = ranks._assign_buckets(
        df, "v", False, 16, "k", "raise", []
    )
    assert total == 5000
    assert len(rows) > 4
    assert max(r[1] for r in rows) < 1000

    with pytest.raises(ValueError, match="skewed buckets"):
        ranks.with_global_row_number(
            df, ["v", "k"], primary="v", rn="rn", n_buckets=16
        ).collect()

    # explicit acceptance keeps the fat bucket but stays exact
    accepted = ranks.with_global_row_number(
        df, ["v", "k"], primary="v", rn="rn", n_buckets=16,
        on_skew="accept",
    ).select("k", "rn")
    _assert_df_equal(accepted, want)


def test_ntile_expr_exact_at_huge_counts(spark):
    """ADVICE r6: the former float-division NTILE could misassign a
    boundary row by one tile once rows-per-tile exceeds 2^26.  The
    integer `div` form is checked at N = 10^12 against Python's exact
    integer arithmetic on tile-boundary row numbers."""
    from lakehouse_ecommerce_etl_pipeline_spark.operators.ranks import (
        ntile_expr,
    )

    n_total, k = 10**12, 10
    base, rem = divmod(n_total, k)
    thresh = rem * (base + 1)

    def py_ntile(rn: int) -> int:
        if rn <= thresh:
            return (rn - 1) // (base + 1) + 1
        return rem + (rn - thresh - 1) // max(base, 1) + 1

    # probe every tile boundary and its neighbours
    probes = sorted(
        {
            max(1, min(n_total, r + d))
            for t in range(1, k + 1)
            for r in (t * base + min(t, rem),)
            for d in (-1, 0, 1)
        }
    )
    df = spark.createDataFrame([(r,) for r in probes], "rn long")
    got = {
        row["rn"]: row["t"]
        for row in df.select(
            "rn", ntile_expr(F.col("rn"), n_total, k).alias("t")
        ).collect()
    }
    for r in probes:
        assert got[r] == py_ntile(r), (r, got[r], py_ntile(r))


def test_running_sums_decimal_and_multi(spark):
    """Decimal value columns run exactly (no silent long truncation —
    ADVICE r6), and the multi-column form shares one probe/counts
    pass while matching per-column window sums."""
    from decimal import Decimal

    from lakehouse_ecommerce_etl_pipeline_spark.operators.ranks import (
        with_global_running_sums,
    )

    df = spark.range(0, 3000).select(
        (F.col("id") % 701).alias("t"),
        F.col("id").alias("uid"),
        (F.col("id") % 9 - 4).alias("d"),
        (F.col("id") % 13)
        .cast("decimal(20,2)")
        .alias("amt"),
    ).withColumn("amt", F.col("amt") / F.lit(4))  # fractional cents
    got = with_global_running_sums(
        df, ["t", "uid"], primary="t",
        value_cols=["d", "amt"], aliases=["run_d", "run_amt"],
    ).select("uid", "run_d", F.col("run_amt").cast("decimal(38,6)"))
    w = Window.orderBy("t", "uid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.select(
        "uid",
        F.sum("d").over(w).cast("long").alias("run_d"),
        F.sum("amt").over(w).cast("decimal(38,6)").alias("run_amt"),
    )
    _assert_df_equal(got, want)


def test_multi_rank_fuzz_with_split_engaged(spark, monkeypatch):
    """Property fuzz of the MULTI-rank form: two independent orders of
    the same rows (one tie-heavy, one near-unique), random directions
    and bucket counts, with the skew floor lowered so the tie-class
    auto-split engages — both released ranks must equal the window
    forms exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import lakehouse_ecommerce_etl_pipeline_spark.operators.ranks as ranks

    monkeypatch.setattr(ranks, "SKEW_FLOOR_ROWS", 5)

    @settings(max_examples=8, deadline=None)
    @given(
        vals=st.lists(
            st.tuples(
                st.integers(min_value=-3, max_value=3),   # tie-heavy
                st.integers(min_value=-50, max_value=50),  # near-unique
            ),
            min_size=1,
            max_size=250,
        ),
        desc_a=st.booleans(),
        desc_b=st.booleans(),
        n_buckets=st.sampled_from([2, 5, 16]),
    )
    def check(vals, desc_a, desc_b, n_buckets):
        df = spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(vals)],
            "key long, a long, b long",
        )
        oa = [F.col("a").desc() if desc_a else F.col("a"), "key"]
        ob = [F.col("b").desc() if desc_b else F.col("b"), "key"]
        got, total = ranks.with_global_row_numbers(
            df,
            [
                ranks.RankSpec(oa, primary="a", descending=desc_a,
                               rn="ra", secondary="key"),
                ranks.RankSpec(ob, primary="b", descending=desc_b,
                               rn="rb", secondary="key"),
            ],
            n_buckets=n_buckets,
        )
        assert total == len(vals)
        want = df.select(
            "key",
            F.row_number().over(Window.orderBy(*oa)).cast("long").alias("ra"),
            F.row_number().over(Window.orderBy(*ob)).cast("long").alias("rb"),
        )
        _assert_df_equal(got.select("key", "ra", "rb"), want)

    check()


def test_promoted_cumulative_plans_equal_window_twins(spark):
    """VERDICT r6 task 2: the last two global cumulative windows
    (ABC classification at part grain, KS drift at support grain) now
    run the boundary-cut prefix sum — pinned equal to their former
    window-form plans."""
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics15 import (
        q_abc_classification,
        q_abc_classification_window_form,
    )
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics45 import (
        q_ks_drift,
        q_ks_drift_window_form,
    )

    pairs = [
        (q_abc_classification, q_abc_classification_window_form),
        (q_ks_drift, q_ks_drift_window_form),
    ]
    for prod, twin in pairs:
        _assert_df_equal(prod(spark, SF0001), twin(spark, SF0001))


def test_global_running_sum_matches_window(spark):
    from lakehouse_ecommerce_etl_pipeline_spark.operators.ranks import (
        with_global_running_sum,
    )

    # unique (t, d) order so per-row prefix sums compare exactly
    df = spark.range(0, 4000).select(
        (F.col("id") % 997).alias("t"),
        (F.col("id") % 5 - 2).alias("d"),
        F.col("id").alias("uid"),
    )
    got = with_global_running_sum(
        df, ["t", "d", "uid"], primary="t", value_col="d", alias="run"
    ).select("uid", "run")
    w = Window.orderBy("t", "d", "uid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.select(
        "uid", F.sum("d").over(w).cast("long").alias("run")
    )
    _assert_df_equal(got, want)


def test_theil_sen_selection_equals_rank_form(spark):
    """The distributed-selection median (global_kth_with_total) must
    equal the full-rank-then-filter form exactly."""
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics62 import (
        q_theil_sen_trend,
        q_theil_sen_trend_rank_form,
    )

    _assert_df_equal(
        q_theil_sen_trend(spark, SF0001),
        q_theil_sen_trend_rank_form(spark, SF0001),
    )


def test_global_kth_with_total_matches_window(spark):
    """Selection fuzz across k positions incl. boundaries and
    out-of-range."""
    from lakehouse_ecommerce_etl_pipeline_spark.operators.ranks import (
        global_kth_with_total,
    )

    df = spark.range(0, 3000).select(
        F.col("id").alias("key"), ((F.col("id") * 131) % 97).alias("v")
    )
    w = Window.orderBy("v", "key")
    ranked = df.select("key", F.row_number().over(w).alias("rn"))
    for k in [1, 2, 1499, 1500, 3000, lambda n: (n + 1) // 2]:
        got, total = global_kth_with_total(
            df, ["v", "key"], primary="v", k=k, n_buckets=8
        )
        assert total == 3000
        kk = k(total) if callable(k) else k
        want = ranked.filter(F.col("rn") == kk).select("key")
        _assert_df_equal(got.select("key"), want)
    empty, total = global_kth_with_total(
        df, ["v", "key"], primary="v", k=3001, n_buckets=8
    )
    assert total == 3000 and empty.count() == 0


def test_decimal_tie_class_not_misdeclared_unit():
    """ADVICE r7 (medium), decision-level pin: two DISTINCT decimal
    primaries that collide in double while abs < 2^53 must NOT be
    declared a splittable tie class — the former double-cast min==max
    proof would have split the bucket by the secondary, reordering
    rows with distinct primaries and corrupting ranks.  Pure-Python
    over native collected values, so no engine sketch behavior can
    mask the regression (this decision fn is shared by BOTH the
    single-rank and multi-rank fat-stats paths)."""
    from decimal import Decimal

    from lakehouse_ecommerce_etl_pipeline_spark.operators.ranks import (
        _split_decisions,
    )

    a = Decimal("100000000000000.0001")
    b = Decimal("100000000000000.0002")
    assert a != b and float(a) == float(b) and abs(float(a)) < 2.0**53
    stats = {0: {"__lo": a, "__hi": b, "__sb": [1.0, 2.0], "__snulls": 0}}
    sub, splittable, unsplit = _split_decisions(
        [0], stats, {0: 1000}, 100, True, "accept", "v", "k"
    )
    assert unsplit == [0] and not splittable and not sub
    # a GENUINE tie class (native equality) still splits
    stats = {0: {"__lo": a, "__hi": a, "__sb": [1.0, 2.0], "__snulls": 0}}
    sub, splittable, unsplit = _split_decisions(
        [0], stats, {0: 1000}, 100, True, "accept", "v", "k"
    )
    assert splittable == [0] and not unsplit and sub


def test_decimal_tie_class_not_misdeclared(spark, monkeypatch):
    """End-to-end twin of the unit pin, through the SINGLE-rank path
    (with_global_running_sum → _assign_buckets), whose probe really is
    ``_probe_cuts`` — so pinning the cuts genuinely co-locates both
    colliding decimals in one fat bucket (the multi-rank path probes
    inline; its decision logic is the shared fn the unit test pins).
    The mixed bucket must raise under on_skew='raise' and stay exact
    under 'accept'."""
    from decimal import Decimal

    import lakehouse_ecommerce_etl_pipeline_spark.operators.ranks as ranks

    monkeypatch.setattr(ranks, "SKEW_FLOOR_ROWS", 10)
    a = Decimal("100000000000000.0001")
    b = Decimal("100000000000000.0002")
    rows = [(i, a if i % 2 == 0 else b, 1) for i in range(2000)]
    rows += [(2000 + i, Decimal(i), 1) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, v decimal(25,4), one int")
    # pin the probe so BOTH colliding decimals land in one fat bucket
    monkeypatch.setattr(
        ranks, "_probe_cuts",
        lambda *args, **kwargs: [Decimal(50), Decimal(90)],
    )
    with pytest.raises(ValueError, match="skewed buckets"):
        ranks.with_global_running_sum(
            df, ["v", "k"], primary="v", value_col="one", alias="run",
            n_buckets=64, secondary="k",
        )
    got = ranks.with_global_running_sum(
        df, ["v", "k"], primary="v", value_col="one", alias="run",
        n_buckets=64, secondary="k", on_skew="accept",
    ).select("k", "run")
    w = Window.orderBy("v", "k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.select("k", F.sum("one").over(w).cast("long").alias("run"))
    _assert_df_equal(got, want)


def test_split_reverify_raises_on_ineffective_secondary(spark, monkeypatch):
    """ADVICE r7: a near-constant secondary inside a fat tie class
    collapses the sketched cuts to ineffective ones; the recount must
    re-check the balance guarantee and raise under on_skew='raise'
    instead of silently keeping the fat bucket."""
    import lakehouse_ecommerce_etl_pipeline_spark.operators.ranks as ranks

    monkeypatch.setattr(ranks, "SKEW_FLOOR_ROWS", 10)
    df = spark.range(0, 3000).select(
        F.col("id").alias("k"),
        F.lit(1).cast("long").alias("v"),
        F.lit(7).cast("long").alias("s"),
    )
    with pytest.raises(ValueError, match="ineffective"):
        ranks.with_global_row_number(
            df, ["v", "s", "k"], primary="v", rn="rn", n_buckets=16,
            secondary="s",
        )
    # explicit acceptance keeps the fat bucket and ranks stay exact
    got = ranks.with_global_row_number(
        df, ["v", "s", "k"], primary="v", rn="rn", n_buckets=16,
        secondary="s", on_skew="accept",
    ).select("k", "rn")
    w = Window.orderBy("v", "s", "k")
    want = df.select("k", F.row_number().over(w).cast("long").alias("rn"))
    _assert_df_equal(got, want)


def test_r8_promoted_plans_equal_window_twins(spark):
    """VERDICT r8 tasks 3-4: the two plans the registry-wide audit
    caught (fact-grain cumulative window in the decision stump,
    dimension-grain row_numbers in surrogate assignment) now run the
    boundary-cut machinery — pinned equal to their former window-form
    plans."""
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics47 import (
        q_decision_stump,
        q_decision_stump_window_form,
    )
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics52 import (
        q_surrogate_keys,
        q_surrogate_keys_window_form,
    )

    pairs = [
        (q_decision_stump, q_decision_stump_window_form),
        (q_surrogate_keys, q_surrogate_keys_window_form),
    ]
    for prod, twin in pairs:
        _assert_df_equal(prod(spark, SF0001), twin(spark, SF0001))


def test_running_sum_with_tie_class_split(spark, monkeypatch):
    """The split recount must re-aggregate the per-bucket VALUE sums
    (not just counts) — a stale offset after a tie-class split would
    silently corrupt every prefix sum in later buckets.  Near-constant
    primary forces the split; result pinned to the window twin."""
    import lakehouse_ecommerce_etl_pipeline_spark.operators.ranks as ranks

    monkeypatch.setattr(ranks, "SKEW_FLOOR_ROWS", 10)
    df = spark.range(0, 4000).select(
        (F.col("id") % 2).alias("t"),
        F.col("id").alias("uid"),
        (F.col("id") % 7 - 3).alias("d"),
    )
    got = ranks.with_global_running_sums(
        df, ["t", "uid"], primary="t", value_cols=["d"], aliases=["run"],
        secondary="uid", n_buckets=16,
    ).select("uid", "run")
    w = Window.orderBy("t", "uid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.select("uid", F.sum("d").over(w).cast("long").alias("run"))
    _assert_df_equal(got, want)


def test_promoted_plans_partitioning_invariant(spark):
    """Boundary-cut results must not depend on the shuffle partition
    count (literal cuts + per-bucket sorts are partitioning-free by
    construction) — the canary the r2 suite runs for older plans,
    extended to the r8 promotions."""
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics47 import (
        q_decision_stump,
    )
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics52 import (
        q_surrogate_keys,
    )

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    base_stump = q_decision_stump(spark, SF0001).collect()
    base_sk = sorted(
        q_surrogate_keys(spark, SF0001).collect(),
        key=lambda r: r["p_partkey"],
    )
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt_stump = q_decision_stump(spark, SF0001).collect()
        alt_sk = sorted(
            q_surrogate_keys(spark, SF0001).collect(),
            key=lambda r: r["p_partkey"],
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert alt_stump == base_stump
    assert alt_sk == base_sk


def test_integer_islands_equals_window_twin(spark):
    """r8 late promotion: the islands rank moved onto the boundary-cut
    machinery — pinned equal to the former unpartitioned-window plan."""
    from lakehouse_ecommerce_etl_pipeline_spark.plans.analytics16 import (
        q_integer_islands,
        q_integer_islands_window_form,
    )

    _assert_df_equal(
        q_integer_islands(spark, SF0001),
        q_integer_islands_window_form(spark, SF0001),
    )
