"""Pins for the r12-optimization ICU case-mapping flip (see
OPTIMIZATION_r12.md): ``spark.sql.icu.caseMappings.enabled=false``
restores the pre-4.1 JVM ``lower()``/``upper()`` path, removing a
~5-minute single-threaded per-JVM class init
(``CollationAwareUTF8String.<clinit>``). That is result-identical
ONLY because (a) this corpus is pure ASCII — where the Unicode simple
case mappings ICU and the JVM both implement coincide — and (b) the
package calls no titlecase expression (``initcap``), the one ASCII
case with engine-divergent word segmentation. Both preconditions are
pinned here, implementation-independently (pyarrow, no Spark).
"""

from __future__ import annotations

import glob
import os
import subprocess

import pyarrow.parquet as pq
import pyarrow.compute as pc
import pytest

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lakehouse_ecommerce_etl_pipeline_spark",
)


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_all_string_columns_pure_ascii(sf):
    """ICU and JVM case mappings are bit-identical on ASCII; the flip
    is safe iff no string column carries a non-ASCII codepoint."""
    base = f"/root/testdata/{sf}"
    if not os.path.isdir(base):
        pytest.skip(f"{base} absent")
    checked = 0
    for path in sorted(glob.glob(os.path.join(base, "*.parquet"))):
        t = pq.read_table(path)
        for name, col in zip(t.column_names, t.columns):
            if col.type != "string" and str(col.type) != "large_string":
                continue
            # max codepoint < 128 over every row (nulls drop out)
            joined = pc.binary_join_element_wise(
                pc.cast(col.combine_chunks(), "string"), "", null_handling="skip"
            )
            # cheap and exact: utf8 length == byte length ⇔ pure ASCII
            n_chars = pc.sum(pc.utf8_length(col)).as_py() or 0
            n_bytes = pc.sum(pc.binary_length(col)).as_py() or 0
            assert n_chars == n_bytes, (
                f"{path}:{name} contains non-ASCII text — the ICU "
                "case-mapping flip in session.py is no longer "
                "result-identical; re-audit before keeping it"
            )
            checked += 1
    assert checked > 0


def test_no_titlecase_expression_in_package():
    """ASCII-equality between ICU and JVM holds for lower/upper but
    NOT for initcap (word segmentation differs, e.g. at hyphens):
    the package must stay initcap-free while the flag is flipped."""
    out = subprocess.run(
        ["grep", "-rn", "--include=*.py", "-e", "initcap", "-e", "toTitleCase", PKG],
        capture_output=True,
        text=True,
    )
    def is_code(line: str) -> bool:
        # grep output is path:lineno:content — only flag CONTENT that
        # is code, not comments/docstrings talking about the topic
        content = line.split(":", 2)[-1].strip()
        return not content.startswith("#")

    hits = [
        line
        for line in out.stdout.splitlines()
        # docstring mention in analytics12 describes the REFERENCE job
        if "analytics12.py" not in line and is_code(line)
    ]
    assert hits == [], f"titlecase expression crept in: {hits}"


def test_session_flips_icu_casemap():
    src = open(os.path.join(PKG, "session.py")).read()
    assert 'spark.sql.icu.caseMappings.enabled", "false"' in src
