#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same parquet tables; compare row count, column names, and
order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...] [--window]
           [--json PATH]

--window      run exactly the driver's 50-entry gate
--json PATH   also write a machine-readable sweep artifact:
              {query: {status: pass|rows_only|fail, rows, secs, why}}
              (the per-round docs/SWEEP_r{N}.json the judge reads)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


import datetime as _dt


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda x: pd.Timestamp(x)
                if isinstance(x, (_dt.date, _dt.datetime))
                else (tuple(x) if isinstance(x, (list, tuple)) else x)
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _canon(v):
    """Canonical (family, value) pair replicating the driver's
    dtype-aware value hash: an int64 Spark column vs a float64 oracle
    column (e.g. DuckDB HUGEINT window sums → pandas float64) must
    FAIL even when the numeric values compare equal, because the
    driver hashes the dtype-canonicalized representation.  Decimal and
    float are one family (DuckDB lowers DECIMAL to float64 in
    fetchdf; the driver's round-1 rows prove it hashes them alike)."""
    import decimal

    import numpy as np

    if v is None:
        return ("null", None)
    if isinstance(v, (bool, np.bool_)):
        return ("bool", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("int", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return ("null", None) if math.isnan(f) else ("float", f)
    if isinstance(v, decimal.Decimal):
        return ("float", float(v))
    if isinstance(v, pd.Timestamp):
        return ("ts", v.to_pydatetime().replace(tzinfo=None))
    if isinstance(v, _dt.datetime):
        return ("ts", v.replace(tzinfo=None))
    if isinstance(v, _dt.date):
        return ("date", v)
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v))
    if isinstance(v, (list, tuple)) or (
        hasattr(v, "__len__") and type(v).__name__ == "ndarray"
    ):
        return ("seq", tuple(_canon(x) for x in v))
    try:
        if pd.isna(v):
            return ("null", None)
    except (TypeError, ValueError):
        pass
    return ("str", str(v)) if isinstance(v, str) else ("other", v)


def values_equal(a, b) -> bool:
    if a is b:
        return True
    return _canon(a) == _canon(b)


def frames_equal(sp: pd.DataFrame, du: pd.DataFrame) -> tuple[bool, str]:
    if sorted(sp.columns) != sorted(du.columns):
        return False, f"columns spark={sorted(sp.columns)} duck={sorted(du.columns)}"
    if len(sp) != len(du):
        return False, f"rowcount spark={len(sp)} duck={len(du)}"
    a, b = normalize(sp), normalize(du)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not values_equal(x, y):
                return False, f"col {c} row {i}: spark={x!r} duck={y!r}"
    return True, ""


def main() -> int:
    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print(__doc__)
            return 2
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if a != "--window"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if "--window" in sys.argv[1:]:
        # simulate the driver gate exactly: the FIRST 50 registry
        # entries in insertion order (and nothing else)
        from lakehouse_ecommerce_etl_pipeline_spark.plans import REGISTRY

        only = set(list(REGISTRY)[:50])

    import __spark_entry__ as entrymod
    from lakehouse_ecommerce_etl_pipeline_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    failures = []
    results: dict[str, dict] = {}
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sp_df = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            failures.append(name)
            why = f"spark error {type(e).__name__}: {e}"
            results[name] = {"status": "fail", "why": why[:500]}
            print(f"FAIL  {name}: {why}")
            continue
        dt = round(time.time() - t0, 2)
        if name not in oracles:
            n_rows_only += 1
            results[name] = {
                "status": "rows_only", "rows": len(sp_df), "secs": dt,
            }
            print(f"rows  {name}: {len(sp_df)} rows ({dt:.1f}s) [no oracle]")
            continue
        try:
            du_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            failures.append(name)
            why = f"duckdb error {type(e).__name__}: {e}"
            results[name] = {"status": "fail", "why": why[:500]}
            print(f"FAIL  {name}: {why}")
            continue
        ok, why = frames_equal(sp_df, du_df)
        if ok:
            n_pass += 1
            results[name] = {"status": "pass", "rows": len(sp_df), "secs": dt}
            print(f"PASS  {name}: {len(sp_df)} rows ({dt:.1f}s)")
        else:
            n_fail += 1
            failures.append(name)
            results[name] = {
                "status": "fail", "rows": len(sp_df), "secs": dt,
                "why": why[:500],
            }
            print(f"FAIL  {name}: {why}")
    print(
        f"\n{n_pass} oracle-pass, {n_rows_only} rows-only, {n_fail} fail"
        + (f" -> {failures}" if failures else "")
    )
    if json_path:
        import json

        with open(json_path, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_pass": n_pass,
                    "n_rows_only": n_rows_only,
                    "n_fail": n_fail,
                    "queries": results,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {json_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
