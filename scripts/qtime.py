#!/usr/bin/env python
"""Time individual registered queries through the noop sink (guide
§1.4): full cost = plan construction (incl. any eager driver-side
iteration the query performs) + one complete execution, min-of-N.

Usage: python scripts/qtime.py SF_DIR REPS query [query ...]

Prints one JSON line {query: best_sec}. Used for the r12 interleaved
A/B measurements (run old/new alternately in the same minutes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_ecommerce_etl_pipeline_spark import plans
from lakehouse_ecommerce_etl_pipeline_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2])
    names = sys.argv[3:]
    spark = get_spark("qtime")
    qs = plans.queries()
    # absorb session spin-up / parquet footer reads outside the timings
    qs["q_count"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
