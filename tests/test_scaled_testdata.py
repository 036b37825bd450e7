"""gen_scaled_testdata: the scale-stress data must preserve the
properties the sf1 measurements rely on — referential integrity,
exact k-fold cardinalities, and per-key densities."""

from __future__ import annotations

import os
import subprocess
import sys

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scaled") / "k3")
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "gen_scaled_testdata.py"),
            "3",
            out,
        ],
        check=True,
        capture_output=True,
    )
    return out


def _col(d, table, col):
    return pq.read_table(os.path.join(d, f"{table}.parquet"), columns=[col])[col]


SRC = "/root/testdata/sf0.1"


def test_cardinalities_scale_exactly_k(scaled):
    for t in ["customer", "supplier", "part", "orders", "lineitem"]:
        n_src = pq.read_metadata(os.path.join(SRC, f"{t}.parquet")).num_rows
        n_out = pq.read_metadata(os.path.join(scaled, f"{t}.parquet")).num_rows
        assert n_out == 3 * n_src, t
    for t in ["region", "nation"]:
        n_src = pq.read_metadata(os.path.join(SRC, f"{t}.parquet")).num_rows
        n_out = pq.read_metadata(os.path.join(scaled, f"{t}.parquet")).num_rows
        assert n_out == n_src, t


def test_referential_integrity_held(scaled):
    custs = set(_col(scaled, "customer", "c_custkey").to_pylist())
    assert set(_col(scaled, "orders", "o_custkey").to_pylist()) <= custs
    supps = set(_col(scaled, "supplier", "s_suppkey").to_pylist())
    assert set(_col(scaled, "lineitem", "l_suppkey").to_pylist()) <= supps
    parts = set(_col(scaled, "part", "p_partkey").to_pylist())
    assert set(_col(scaled, "lineitem", "l_partkey").to_pylist()) <= parts
    orders = set(_col(scaled, "orders", "o_orderkey").to_pylist())
    assert set(_col(scaled, "lineitem", "l_orderkey").to_pylist()) <= orders


def test_keys_stay_unique_and_density_preserved(scaled):
    keys = _col(scaled, "orders", "o_orderkey")
    assert pc.count_distinct(keys).as_py() == len(keys)
    # per-customer order density identical to the source distribution
    src_orders = _col(SRC, "orders", "o_custkey").to_pylist()
    out_orders = _col(scaled, "orders", "o_custkey").to_pylist()
    from collections import Counter

    src_density = Counter(Counter(src_orders).values())
    out_density = Counter(Counter(out_orders).values())
    assert out_density == {k: 3 * v for k, v in src_density.items()}
