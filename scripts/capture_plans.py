#!/usr/bin/env python
"""Capture ``.explain("formatted")`` for headline queries into
``plans/r12/<query>_<tag>.txt`` — the optimization round's before/after
plan evidence (guide §1: measure first; §7.2: read the plan).

Usage: python scripts/capture_plans.py <tag> [sf_dir] [query ...]
  tag     "before" / "after" (file suffix)
  sf_dir  defaults to /root/testdata/sf0.1
  query   defaults to the bench HEADLINE list
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from lakehouse_ecommerce_etl_pipeline_spark import plans  # noqa: E402
from lakehouse_ecommerce_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or HEADLINE
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    qs = plans.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record the failure
            txt = f"EXPLAIN FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"{name}: {len(txt)} bytes -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
