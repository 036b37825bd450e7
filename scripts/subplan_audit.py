"""Registry-wide duplicated-join-subplan audit (round 9).

The r9 sf1 measurement caught q_clustering_coefficient executing its
triangle-enumeration joins THREE times: the per-corner credit unioned
three projections of the same DataFrame, Spark does not dedupe common
subplans, and column pruning specialized each branch's scans so
exchange reuse could not fold them either (161 s vs 50 s after the
explode fix — docs/SCALE_STRESS_SF1.md §r9).  That is a CLASS of
plan bug: any self-union / self-join that re-references an expensive
subplan re-executes it, silently multiplying the dominant cost.

This audit walks EVERY registered query's executed plan at sf0.001
and flags plans where the same join subtree appears more than once.
Fingerprint per join node = the operator-name skeleton of its subtree
(tree shape + node names, column lists and expr-ids stripped) + the
join's own keys with expr-ids stripped — so the three pruned copies
of the old clustering shape collapse to one fingerprint, while
differently-keyed or differently-shaped joins stay distinct.
Each query is EXECUTED first and the FINAL adaptive plan analyzed,
truncated at the `== Initial Plan ==` echo: under AQE, exchange reuse
is detected at RUNTIME, so an initial plan shows two copies of a
subplan that execution folds into one ReusedExchange (q_supplier_hhi:
the fact join prints twice pre-execution, runs once).  Properly
reused subtrees (ReusedExchange / ReusedQueryStage) print WITHOUT
children, so they never double-count, and lineage printed beneath an
InMemoryRelation is MASKED — a persisted generation (pagerank/kcore
discipline) re-prints its full cached lineage in every reference, but
those subtrees read the cache, they do not re-execute.  What remains
flagged is duplication AQE cannot fold — typically column pruning
specializing each branch's scans so the exchanges are no longer
canonically equal (the old q_clustering_coefficient shape).  Nested
duplicates report the outermost node only.

Report-only; offenders feed the committed expectations in
tests/test_plan_quality.py.  Run after any plan change:

    python scripts/subplan_audit.py [sf_dir] > docs/SUBPLAN_AUDIT.txt
"""

from __future__ import annotations

import os
import re
import sys
import time
import traceback
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

_JOIN_RE = re.compile(r"\b(\w*HashJoin|SortMergeJoin|\w*NestedLoopJoin)\b")
_EXPR_ID = re.compile(r"#\d+")
_PLAN_ID = re.compile(r"plan_id=\d+")


def _node_depth(ln: str) -> int:
    """Tree depth = column where the operator name starts (3 chars of
    '+- ' / ':- ' / ':  ' / '   ' markers per level — same convention
    window_audit.py pins with live-session fixtures)."""
    for i, ch in enumerate(ln):
        if ch not in " :+-":
            return i
    return len(ln)


_BCAST_ROOTS = ("BroadcastQueryStage", "BroadcastExchange", "ReusedExchange")


def _node_name(ln: str) -> str:
    d = _node_depth(ln)
    rest = re.sub(r"^\*\(\d+\) ", "", ln[d:])  # whole-stage-codegen tag
    m = re.match(r"[A-Za-z][\w.]*", rest)
    return m.group(0) if m else ""


def duplicated_join_subtrees(plan: str) -> list[tuple[str, int]]:
    """[(fingerprint, count)] for every join subtree shape appearing
    more than once in the plan, outermost duplicates only."""
    lines = plan.splitlines()
    depths = [_node_depth(ln) for ln in lines]
    # mask lineage printed beneath InMemoryRelation: cached references
    # re-print their build plan but read the cache at execution
    masked = [False] * len(lines)
    for i, ln in enumerate(lines):
        if "InMemoryRelation" not in ln or masked[i]:
            continue
        j = i + 1
        while j < len(lines) and depths[j] > depths[i]:
            masked[j] = True
            j += 1
    # normalize broadcast BUILD sides to one token and mask below:
    # AQE may reuse the build of one copy but not the other
    # (BroadcastExchange here, ReusedExchange there), which must not
    # hide that the PROBE side and the join itself execute twice.
    # A reused SHUFFLE, by contrast, stays discriminating: the copy
    # reading a ReusedExchange did not re-run the chain below it.
    bcast_token = [False] * len(lines)
    bcast_sub = [False] * len(lines)
    for i, ln in enumerate(lines):
        if masked[i] or bcast_sub[i]:
            continue
        if _node_name(ln) in _BCAST_ROOTS:
            bcast_token[i] = True
            j = i + 1
            while j < len(lines) and depths[j] > depths[i]:
                bcast_sub[j] = True
                j += 1
    # subtree line-ranges per join node; joins INSIDE a broadcast
    # build stay eligible as roots (two un-reused builds duplicating
    # a join is still double execution)
    spans: list[tuple[int, int]] = []
    for i, ln in enumerate(lines):
        if masked[i] or not _JOIN_RE.search(ln) or "Reused" in ln:
            continue
        j = i + 1
        while j < len(lines) and depths[j] > depths[i]:
            j += 1
        spans.append((i, j))
    by_fp: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for i, j in spans:
        base = depths[i]
        skeleton = []
        skip_below = -1  # depth of an inner broadcast root being masked
        for k in range(i, j):
            if masked[k]:
                continue
            if skip_below >= 0:
                if depths[k] > skip_below:
                    continue
                skip_below = -1
            if bcast_token[k] and k > i:
                skeleton.append(f"{depths[k] - base}:BcastSide")
                skip_below = depths[k]
                continue
            name = _node_name(lines[k])
            if not name:
                continue  # detail/continuation line, not a node
            skeleton.append(f"{depths[k] - base}:{name}")
        keys = _PLAN_ID.sub("", _EXPR_ID.sub("#", lines[i][depths[i]:]))
        keys = re.sub(r"^\*\(\d+\) ", "", keys)
        by_fp["|".join(skeleton) + "||" + keys.strip()].append((i, j))
    dups = {fp: sp for fp, sp in by_fp.items() if len(sp) > 1}
    # outermost only: drop a duplicated fingerprint if every one of its
    # instances nests inside instances of another duplicated fingerprint
    out: list[tuple[str, int]] = []
    for fp, sp in dups.items():
        nested = all(
            any(
                (oi < i and j <= oj)
                for ofp, osp in dups.items()
                if ofp != fp
                for oi, oj in osp
            )
            for i, j in sp
        )
        if not nested:
            out.append((fp, len(sp)))
    return sorted(out)


def main() -> int:
    from lakehouse_ecommerce_etl_pipeline_spark.plans import REGISTRY
    from lakehouse_ecommerce_etl_pipeline_spark.session import get_spark

    spark = get_spark("subplan-audit")
    offenders, errors = [], []
    t_all = time.time()
    for name in sorted(REGISTRY):
        t0 = time.time()
        try:
            df = REGISTRY[name].fn(spark, SF)
            df.collect()  # execute so AQE finalizes exchange reuse
            plan = df._jdf.queryExecution().executedPlan().toString()
            plan = plan.split("== Initial Plan ==")[0]
            dups = duplicated_join_subtrees(plan)
        except Exception:
            errors.append(name)
            print(f"ERROR {name}\n{traceback.format_exc()}", flush=True)
            continue
        status = "OFFENDER" if dups else "ok"
        if dups:
            offenders.append(name)
        print(f"{status:8s} {name} ({time.time() - t0:.1f}s)", flush=True)
        for fp, n in dups:
            join_line = fp.split("||")[1]
            print(f"         x{n}  {join_line[:120]}", flush=True)
    print(
        f"\n=== {len(offenders)} offenders / {len(REGISTRY)} queries, "
        f"{len(errors)} errors, {time.time() - t_all:.0f}s ==="
    )
    for n in offenders:
        print("  ", n)
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
