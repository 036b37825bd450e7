"""Registry-wide single-partition-window audit (VERDICT r7 task 2).

Walks EVERY registered query's executed plan at sf0.001 and reports
each Window operator whose child exchange is SinglePartition — the
one window shape that cannot scale.  Output feeds the committed
allowlist in tests/test_plan_quality.py; run after any plan change:

    python scripts/window_audit.py [sf_dir] > docs/WINDOW_AUDIT.txt
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def _node_depth(ln: str) -> int:
    """Tree depth of a plan line = column where the operator name
    starts (every level adds 3 chars of '+- ' / ':- ' / ':  ' / '   '
    markers)."""
    for i, ch in enumerate(ln):
        if ch not in " :+-":
            return i
    return len(ln)


def window_over_single_partition(plan: str) -> bool:
    """True iff some Window operator's DATA-PATH child chain moves
    unbounded data through an Exchange SinglePartition.

    Walks only the unary chain directly below each Window (Sort /
    Project / Filter / ...), NOT the whole subtree — a 1-row scalar
    aggregate merging through SinglePartition inside a broadcast
    branch of a join further down is legitimate and must not flag
    (the naive subtree scan false-positived on exactly that).  Safe
    terminations: a limit-bounding operator (TakeOrderedAndProject /
    WindowGroupLimit — the rank-filter pushdown bounds what the
    exchange carries to k rows per map partition), or any
    partitioned Exchange.  After an Exchange SinglePartition, only a
    WindowGroupLimit(Partial) directly below rescues it."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Window [" not in ln or "WindowGroupLimit" in ln:
            continue
        depth = _node_depth(ln)
        expected = depth + 3
        seen_single = False
        for sub in lines[i + 1:]:
            d = _node_depth(sub)
            if d <= depth:
                break  # subtree ended
            if d != expected:
                continue  # deeper detail of a prior chain node
            # `sub` is the next node on the data-path chain
            if seen_single:
                # only a partial group-limit directly below the
                # single-partition exchange bounds the move
                if "WindowGroupLimit" not in sub:
                    return True
                seen_single = False
                break
            if "WindowGroupLimit" in sub or "TakeOrderedAndProject" in sub:
                break  # limit-bounded input
            if "Join" in sub or "CartesianProduct" in sub or "Union" in sub:
                # binary/n-ary node: the unary data path ends here.
                # EnsureRequirements inserts any exchange the Window
                # needs ABOVE the join, so reaching a join without one
                # means the distribution is inherited from the join's
                # streamed side — and plan text prints the BUILD side
                # first for BuildLeft joins, so walking on would enter
                # a broadcast branch and false-positive on its 1-row
                # scalar-aggregate SinglePartition merge (q_gapfill's
                # shape: a PARTITIONED window fed through two joins).
                # DOCUMENTED BLIND SPOT: a join whose BOTH inputs are
                # already SinglePartition passes undetected (pinned by
                # test_single_partition_window_detector's
                # inherited_through_join fixture — flip it consciously
                # if this walk ever learns to descend into joins).
                break
            if "Exchange SinglePartition" in sub:
                seen_single = True
            elif "ShuffleQueryStage" in sub:
                # AQE stage wrappers are TRANSPARENT: a stage can wrap
                # an Exchange SinglePartition printed one level deeper,
                # so stopping here would false-negative the gate on
                # post-execution plans.
                pass
            elif "Exchange" in sub and "BroadcastExchange" not in sub:
                break  # partitioned shuffle — balanced window
            expected = d + 3
        if seen_single:
            return True
    return False


def cartesian_product(plan: str) -> bool:
    """True iff the plan contains a CartesianProduct — the non-broadcast
    cross join Spark falls back to when neither side fits a broadcast:
    |A|×|B| row evaluation, the other unconditional scale killer.
    (BroadcastNestedLoopJoin is NOT flagged: every registry use is a
    crossJoin against an explicitly-broadcast 1-row scalar aggregate,
    which is bounded by construction.)"""
    return "CartesianProduct" in plan


def main() -> int:
    from lakehouse_ecommerce_etl_pipeline_spark.plans import REGISTRY
    from lakehouse_ecommerce_etl_pipeline_spark.session import get_spark

    spark = get_spark("window-audit")
    offenders, errors = [], []
    t_all = time.time()
    for name in sorted(REGISTRY):
        t0 = time.time()
        try:
            df = REGISTRY[name].fn(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
            bad = window_over_single_partition(plan)
            cart = cartesian_product(plan)
        except Exception:
            errors.append(name)
            print(f"ERROR {name}\n{traceback.format_exc()}", flush=True)
            continue
        status = "OFFENDER" if bad else ("CARTESIAN" if cart else "ok")
        if bad:
            offenders.append(name)
        if cart:
            offenders.append(f"{name} [cartesian]")
        print(f"{status:8s} {name} ({time.time() - t0:.1f}s)", flush=True)
    print(f"\n=== {len(offenders)} offenders / {len(REGISTRY)} queries, "
          f"{len(errors)} errors, {time.time() - t_all:.0f}s ===")
    for n in offenders:
        print("  ", n)
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
