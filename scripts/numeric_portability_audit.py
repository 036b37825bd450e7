"""Registry-wide cross-engine numeric-portability audit (round 10).

The r9 driver window's only red row in nine rounds — q_ewma_taps —
was a CLASS bug, not a logic bug: ``128 * rev`` where ``rev`` is
DECIMAL(38,8).  Integer × wide-decimal products sit on
version-dependent typing rules in BOTH engines: Spark reduces result
scale under ``spark.sql.decimalOperations.allowPrecisionLoss``
(38,8 → 38,6), and DuckDB's behavior at precision overflow has
changed across releases (clamp-to-38 vs promote-to-double, which
then rounds half-even at the cast back).  The same plan can
therefore hash-match on one engine build and diverge on another —
exactly what the r9 driver observed while the local replica passed.
The engine already hit this class once before (PageRank,
plans/analytics16.py: DECIMAL(25,15) lattice → pure-integer 1e-18
lattice after a Spark-HALF_UP vs DuckDB-half-even divergence); the
r10 fix re-latticed the EWMA onto BIGINT cents the same way.

DESIGN §21 rule (this audit is its mechanical teeth): oracle SQL and
plan expressions must not form integer × DECIMAL(p≥30, s>0)
products, and must not route double-derived values through
scale-reducing decimal arithmetic.  Exact-integer lattices (BIGINT
cents, 1e-18 fixpoints) or end-of-plan single casts are the
portable alternatives.

Two sweeps, both report-only (offenders feed the committed
expectations in tests/test_plan_quality.py):

1. ORACLE SQL — for every registered oracle: collect aliases defined
   by a wide-decimal cast (``CAST(... AS DECIMAL(p,s)) AS name``
   with p ≥ 30, s > 0) and flag any integer-literal product against
   such an alias (``128 * rev``, ``rev * 2``, including through
   COALESCE/LAG/LEAD wrappers) or against an inline wide-decimal
   cast.
2. PLAN SOURCE — for every ``plans/*.py`` function: flag functions
   that BOTH cast to a wide decimal (p ≥ 30, s > 0) AND multiply by
   an integer ``F.lit``; plus apply sweep 1 to embedded SQL string
   literals.  (The Python sweep intentionally over-approximates —
   the pairing is per-function, not per-expression — so a flagged
   function needs eyeball triage; the committed expectation is
   zero.)

Run after any plan/oracle change that touches decimal arithmetic:

    python scripts/numeric_portability_audit.py > docs/NUMERIC_PORTABILITY_AUDIT.txt
"""

from __future__ import annotations

import ast
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Wide decimal: precision >= 30 with nonzero scale — narrow decimals
# (e.g. DECIMAL(18,2)) never overflow 38 digits under an int-literal
# product, so both engines type them identically.
_WIDE = re.compile(
    r"DECIMAL\s*\(\s*(3[0-8])\s*,\s*([1-9]\d*)\s*\)", re.IGNORECASE
)
_ALIAS_DEF = re.compile(
    r"AS\s+DECIMAL\s*\(\s*(3[0-8])\s*,\s*([1-9]\d*)\s*\)\s*\)\s*AS\s+(\w+)",
    re.IGNORECASE,
)
_PY_WIDE_CAST = re.compile(
    r"decimal\s*\(\s*(3[0-8])\s*,\s*([1-9]\d*)\s*\)", re.IGNORECASE
)


_ANY_ALIAS_DEF = re.compile(
    r"AS\s+DECIMAL\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)\s*\)\s*AS\s+(\w+)",
    re.IGNORECASE,
)


def sql_offences(sql: str) -> list[str]:
    """Integer-literal products against wide-decimal aliases or
    inline wide-decimal casts; plus rule 2's mechanical shapes —
    decimal × decimal products whose result precision overflows 38
    (p1+p2+1 > 38 forces an engine-specific rescale) and divisions
    involving a wide (p ≥ 30) decimal (division scale rules are the
    most build-variable of all)."""
    out = []
    typed = {
        m.group(3): (int(m.group(1)), int(m.group(2)))
        for m in _ANY_ALIAS_DEF.finditer(sql)
    }
    for a, (p1, s1) in typed.items():
        for b, (p2, s2) in typed.items():
            if (
                p1 + p2 + 1 > 38
                and (s1 > 0 or s2 > 0)
                and re.search(rf"\b{re.escape(a)}\s*\*\s*{re.escape(b)}\b", sql)
            ):
                out.append(
                    f"decimal-overflow product: {a}({p1},{s1}) * {b}({p2},{s2})"
                )
            if (p1 >= 30 or p2 >= 30) and re.search(
                rf"\b{re.escape(a)}\s*/\s*{re.escape(b)}\b", sql
            ):
                out.append(
                    f"wide-decimal division: {a}({p1},{s1}) / {b}({p2},{s2})"
                )
    aliases = {m.group(3) for m in _ALIAS_DEF.finditer(sql)}
    for alias in aliases:
        # 128 * rev | 64 * COALESCE(LAG(rev, ...) | rev * 2
        left = re.compile(
            r"\b\d+\s*\*\s*(?:(?:COALESCE|LAG|LEAD|ABS)\s*\(\s*)*"
            + re.escape(alias)
            + r"\b"
        )
        right = re.compile(r"\b" + re.escape(alias) + r"\s*\*\s*\d+\b")
        for pat in (left, right):
            for m in pat.finditer(sql):
                out.append(f"int*wide-decimal alias: {m.group(0).strip()!r}")
    # inline: 128 * CAST(x AS DECIMAL(38,8)) / CAST(...) * 128
    for m in re.finditer(
        r"\b\d+\s*\*\s*CAST\s*\([^()]*AS\s+DECIMAL\s*\(\s*3[0-8]\s*,\s*[1-9]",
        sql,
        re.IGNORECASE,
    ):
        out.append(f"int*inline-wide-cast: {m.group(0).strip()!r}")
    for m in re.finditer(
        r"AS\s+DECIMAL\s*\(\s*3[0-8]\s*,\s*[1-9]\d*\s*\)(?:\s*\))+\s*\*\s*\d+\b",
        sql,
        re.IGNORECASE,
    ):
        out.append(f"inline-wide-cast*int: {m.group(0).strip()!r}")
    return out


def _int_lit_mult(node: ast.AST) -> bool:
    """True if node is a Mult BinOp with an integer F.lit(...) (or a
    bare int constant) on either side."""
    if not (isinstance(node, ast.BinOp) and isinstance(node.op, ast.Mult)):
        return False

    def is_int_side(n: ast.AST) -> bool:
        if isinstance(n, ast.Constant) and isinstance(n.value, int):
            return True
        if isinstance(n, ast.Call):
            fn = n.func
            if (
                isinstance(fn, ast.Attribute)
                and fn.attr == "lit"
                and n.args
            ):
                a = n.args[0]
                if isinstance(a, ast.Constant) and isinstance(a.value, int):
                    return True
                if (
                    isinstance(a, ast.BinOp)
                    and isinstance(a.op, (ast.Pow, ast.Mult))
                ):
                    return True
        return False

    return is_int_side(node.left) or is_int_side(node.right)


# Triaged per-function allowlist for the over-approximate Python
# sweep (per-function pairing, not per-expression).  Every entry
# must state WHY the pairing is safe; re-triage on any edit to the
# named function.
_TRIAGED_OK = {
    # The int-lit product (2*i - n - 1) multiplies row_number ints
    # and scale-0 decimals (decimal(10,0) × decimal(18,0) — exact,
    # identically typed on both engines); the wide decimal(30,8)
    # cast is confined inside floor(sum(...)) → decimal(18,0) and
    # never appears in a product.  No int × DECIMAL(p≥30,s>0) term.
    "q_gini_spend",
}


def py_offences(path: str) -> list[str]:
    src = open(path).read()
    tree = ast.parse(src)
    out = []
    for fn in [n for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)]:
        seg = ast.get_source_segment(src, fn) or ""
        wide_casts = [
            m.group(0)
            for m in _PY_WIDE_CAST.finditer(seg)
            # only .cast("decimal(...)") strings, not prose/docstrings
            if re.search(
                r'cast\s*\(\s*["\']' + re.escape(m.group(0)), seg, re.IGNORECASE
            )
        ]
        int_mults = [n for n in ast.walk(fn) if _int_lit_mult(n)]
        if wide_casts and int_mults and fn.name not in _TRIAGED_OK:
            out.append(
                f"{fn.name} (line {fn.lineno}): wide casts {wide_casts[:3]}"
                f" + {len(int_mults)} int-lit product(s) — triage"
            )
        # embedded SQL literals inside the function
        for n in ast.walk(fn):
            if isinstance(n, ast.Constant) and isinstance(n.value, str):
                if _WIDE.search(n.value) and (
                    "SELECT" in n.value.upper() or "WITH" in n.value.upper()
                ):
                    for off in sql_offences(n.value):
                        out.append(f"{fn.name} embedded SQL: {off}")
    return out


def main() -> int:
    from lakehouse_ecommerce_etl_pipeline_spark import plans

    oracles = plans.oracle_sql()
    total_off = 0
    print(f"numeric-portability audit: {len(oracles)} oracles")
    for name, sql in sorted(oracles.items()):
        offs = sql_offences(sql)
        for off in offs:
            print(f"ORACLE {name}: {off}")
        total_off += len(offs)

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "lakehouse_ecommerce_etl_pipeline_spark",
        "plans",
    )
    files = sorted(
        f for f in os.listdir(pkg) if f.endswith(".py") and f != "__init__.py"
    )
    print(f"plan-source sweep: {len(files)} modules")
    for f in files:
        offs = py_offences(os.path.join(pkg, f))
        for off in offs:
            print(f"PLAN {f}: {off}")
        total_off += len(offs)

    print(f"TOTAL offences: {total_off}")
    return 0 if total_off == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
