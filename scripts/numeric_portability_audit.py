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
3. DOUBLE→DECIMAL CASTS (round 11 — the shape that shipped THROUGH
   the r10 audit's 0-offence report and became q_kfold_assign, the
   driver's one red row in CORRECTNESS_r10): any
   ``CAST(<double-typed source column expr> AS DECIMAL(p,s))`` in an
   oracle, and any ``.cast("decimal(p,s)")`` whose receiver
   references a double-typed source column in a plan.  A
   double→decimal cast's rounding path (shortest-repr vs exact
   binary expansion, HALF_UP vs half-even at scale s) is
   engine-BUILD-sensitive: the same SUM can hash-match against one
   DuckDB release and diverge one ulp on another while row counts
   match.  Portable alternative: snap to the BIGINT integer-cents
   lattice at the scan (``CAST(ROUND(x*100) AS BIGINT)`` — 2-dp
   money doubles are never near a .5 boundary at ×100) and keep all
   downstream arithmetic int64, the q_ewma_taps / q_kfold_assign
   fix.  Inner integer casts (``CAST(... AS BIGINT/INT)``) are
   masked before matching — the sanctioned lattice routes through
   them.  Limitation (documented, accepted): a double column laundered
   through an intermediate SQL alias (``SELECT o_totalprice AS p``
   then ``CAST(p AS DECIMAL)``) is caught only when the alias is
   defined in the same oracle text scanned here; the sweep also
   tracks alias definitions one level deep for that reason.

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


# ------------------------------------------------------------------
# Rule 3: double→DECIMAL casts.
#
# Double-typed source columns in the driver's testdata tables,
# cross-checked against the parquet schemas at import when testdata
# is present (the frozen set is the committed source of truth so the
# audit still runs on a testdata-less checkout).  NOTE: events.value
# is named just "value" — inside a CAST(... AS DECIMAL) region any
# bare `value` word is overwhelmingly the events column or a
# double-derived alias, so the over-approximation is intentional
# (allowlist with rationale if a false positive ever appears).
_DOUBLE_COLS = frozenset(
    {
        "c_acctbal",
        "s_acctbal",
        "p_retailprice",
        "o_totalprice",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "value",
    }
)


def _crosscheck_double_cols() -> None:
    """If testdata is reachable, verify the frozen set covers every
    float column the parquet schemas declare (drift alarm)."""
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    base = sf if os.path.isdir(sf) else "/root/testdata/sf0.001"
    if not os.path.isdir(base):
        return
    try:
        import pyarrow.parquet as pq
    except ImportError:
        return
    missing = []
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        p = os.path.join(base, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        for f in pq.read_schema(p):
            if str(f.type) in ("double", "float") and f.name not in _DOUBLE_COLS:
                missing.append(f"{t}.{f.name}")
    if missing:
        raise SystemExit(
            f"rule-3 _DOUBLE_COLS is stale — parquet declares float "
            f"columns not in the frozen set: {missing}"
        )


def _balanced(text: str, open_idx: int) -> int:
    """Index just past the ')' matching the '(' at open_idx."""
    depth = 0
    for i in range(open_idx, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    return len(text)


_CAST_OPEN = re.compile(r"\bCAST\s*\(", re.IGNORECASE)
_DEC_TAIL = re.compile(
    r"^(?P<expr>[\s\S]*?)\s+AS\s+DECIMAL\s*\(\s*(?P<p>\d+)\s*,\s*(?P<s>\d+)\s*\)\s*$",
    re.IGNORECASE,
)
_INT_TAIL = re.compile(
    r"AS\s+(?:BIGINT|HUGEINT|INT|INTEGER|SMALLINT|TINYINT|LONG)\s*$",
    re.IGNORECASE,
)
_DOUBLE_ALIAS_DEF = re.compile(
    r"\b(\w+)\s+AS\s+(\w+)\b", re.IGNORECASE
)


def _iter_casts(sql: str):
    """Yield (inner_expr, full_span_text) for every balanced
    ``CAST( ... )`` region in sql, innermost included."""
    for m in _CAST_OPEN.finditer(sql):
        start = m.end() - 1
        end = _balanced(sql, start)
        yield sql[start + 1 : end - 1], sql[m.start() : end]


def _mask_integer_casts(expr: str) -> str:
    """Blank out inner CAST(... AS <integer type>) regions — the
    sanctioned ROUND(x*100)→BIGINT lattice routes through them, and
    an integer value re-cast to decimal is exact."""
    out = expr
    changed = True
    while changed:
        changed = False
        for inner, full in _iter_casts(out):
            if _INT_TAIL.search(inner.rstrip()):
                out = out.replace(full, " __INTLATTICE__ ", 1)
                changed = True
                break
    return out


def _double_words(sql: str) -> set[str]:
    """Double source columns plus one level of aliases defined
    directly FROM a double column in this oracle text."""
    words = set(_DOUBLE_COLS)
    for m in _DOUBLE_ALIAS_DEF.finditer(sql):
        if m.group(1).lower() in {w.lower() for w in _DOUBLE_COLS}:
            words.add(m.group(2))
    return words


def rule3_sql_offences(sql: str) -> list[str]:
    """Rule 3 (SQL side): CAST(<expr referencing a double column>
    AS DECIMAL(p,s)) — engine-build-sensitive rounding."""
    out = []
    doubles = _double_words(sql)
    pat = re.compile(
        r"\b(" + "|".join(re.escape(w) for w in sorted(doubles)) + r")\b",
        re.IGNORECASE,
    )
    for inner, full in _iter_casts(sql):
        m = _DEC_TAIL.match(inner)
        if not m:
            continue
        expr = m.group("expr").strip()
        # Exactness carve-out: CAST(FLOOR(<anything>) AS DECIMAL(p,0))
        # — FLOOR yields an integer-valued double (deterministic given
        # identical IEEE inputs) and a scale-0 cast of an integer has
        # no rounding path on any engine build.
        if int(m.group("s")) == 0 and re.match(
            r"(?is)^(?:FLOOR|CEIL|CEILING)\s*\(", expr
        ):
            body_end = _balanced(expr, expr.index("("))
            if expr[body_end:].strip() == "":
                continue
        masked = _mask_integer_casts(m.group("expr"))
        hit = pat.search(masked)
        if hit:
            snippet = " ".join(full.split())
            out.append(
                f"double->decimal cast (rule 3, col {hit.group(0)!r}): "
                f"{snippet[:120]!r}"
            )
    return out


def rule3_py_offences(fn: ast.FunctionDef) -> list[str]:
    """Rule 3 (plan side): ``<receiver referencing a double source
    column>.cast("decimal(p,s)")``.  Receiver subtrees behind an
    integer ``.cast("bigint"/"int"/"long")`` are masked — that is
    the sanctioned lattice."""
    out = []
    int_casts = ("bigint", "int", "integer", "long", "smallint", "tinyint")

    def refs_double(node: ast.AST) -> str | None:
        # pruning walk: don't descend into integer-cast subtrees
        stack = [node]
        while stack:
            n = stack.pop()
            if (
                isinstance(n, ast.Call)
                and isinstance(n.func, ast.Attribute)
                and n.func.attr == "cast"
                and n.args
                and isinstance(n.args[0], ast.Constant)
                and isinstance(n.args[0].value, str)
                and n.args[0].value.strip().lower() in int_casts
            ):
                continue
            if (
                isinstance(n, ast.Constant)
                and isinstance(n.value, str)
                and n.value in _DOUBLE_COLS
            ):
                return n.value
            stack.extend(ast.iter_child_nodes(n))
        return None

    for n in ast.walk(fn):
        if (
            isinstance(n, ast.Call)
            and isinstance(n.func, ast.Attribute)
            and n.func.attr == "cast"
            and n.args
            and isinstance(n.args[0], ast.Constant)
            and isinstance(n.args[0].value, str)
            and re.match(
                r"\s*decimal\s*\(\s*\d+\s*,\s*[1-9]", n.args[0].value, re.IGNORECASE
            )
        ):
            col = refs_double(n.func.value)
            if col:
                out.append(
                    f"double->decimal plan cast (rule 3, col {col!r}) at "
                    f"line {n.lineno}"
                )
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


# Triaged allowlist for the over-approximate sweeps.  Keyed by
# (module, function) and pinned to a content hash of the function's
# source segment (ADVICE r10: a bare-name key would excuse any future
# same-named function, or a rewrite that reintroduces the offence,
# without re-triage).  Every entry must state WHY the shape is safe;
# any edit to the named function changes the hash and forces
# re-triage (the audit reports a stale-hash offence).
_TRIAGED_OK: dict[tuple[str, str], str] = {
    # EMPTY since round 11: the one former entry (q_gini_spend's
    # int-lit × scale-0-decimal pairing) was retired when the whole
    # registry moved onto integer lattices.  Entry format:
    # (module basename, function name) → sha256[:16] of the
    # function's source segment; a stale hash is REPORTED for
    # re-triage, never silently excused.
}


def _fn_hash(seg: str) -> str:
    import hashlib as _h

    return _h.sha256(seg.encode()).hexdigest()[:16]


def _allowlisted(modname: str, fn_name: str, seg: str) -> tuple[bool, str]:
    """(allowlisted, note).  A matching (module, fn) key with a STALE
    hash does not excuse — it reports for re-triage instead."""
    key = (modname, fn_name)
    if key not in _TRIAGED_OK:
        return False, ""
    expected = _TRIAGED_OK[key]
    actual = _fn_hash(seg)
    if actual == expected:
        return True, ""
    return False, (
        f"{fn_name}: allowlist hash STALE (expected {expected}, "
        f"source now {actual}) — function edited since triage, re-triage"
    )


def py_offences(path: str) -> list[str]:
    src = open(path).read()
    modname = os.path.basename(path)
    tree = ast.parse(src)
    out = []
    for fn in [n for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)]:
        seg = ast.get_source_segment(src, fn) or ""
        ok, stale_note = _allowlisted(modname, fn.name, seg)
        if stale_note:
            out.append(stale_note)
        wide_casts = [
            m.group(0)
            for m in _PY_WIDE_CAST.finditer(seg)
            # only .cast("decimal(...)") strings, not prose/docstrings
            if re.search(
                r'cast\s*\(\s*["\']' + re.escape(m.group(0)), seg, re.IGNORECASE
            )
        ]
        int_mults = [n for n in ast.walk(fn) if _int_lit_mult(n)]
        if wide_casts and int_mults and not ok:
            out.append(
                f"{fn.name} (line {fn.lineno}): wide casts {wide_casts[:3]}"
                f" + {len(int_mults)} int-lit product(s) — triage"
            )
        # rule 3: double-col receiver cast to decimal
        if not ok:
            out.extend(f"{fn.name}: {o}" for o in rule3_py_offences(fn))
        # embedded SQL literals inside the function
        for n in ast.walk(fn):
            if isinstance(n, ast.Constant) and isinstance(n.value, str):
                is_sql = "SELECT" in n.value.upper() or "WITH" in n.value.upper()
                if is_sql and _WIDE.search(n.value):
                    for off in sql_offences(n.value):
                        out.append(f"{fn.name} embedded SQL: {off}")
                if is_sql and not ok:
                    for off in rule3_sql_offences(n.value):
                        out.append(f"{fn.name} embedded SQL: {off}")
    return out


def main() -> int:
    from lakehouse_ecommerce_etl_pipeline_spark import plans

    _crosscheck_double_cols()
    oracles = plans.oracle_sql()
    total_off = 0
    print(f"numeric-portability audit: {len(oracles)} oracles (rules 1-3)")
    for name, sql in sorted(oracles.items()):
        offs = sql_offences(sql) + rule3_sql_offences(sql)
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
