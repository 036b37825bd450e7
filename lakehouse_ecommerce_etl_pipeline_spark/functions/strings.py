"""String scalar functions: path routing, split, basename.

reference: lambda/trigger_lakehouse_stepfn_on_upload/lambda_function.py:17
(accept key iff it starts with ``raw/`` and ends ``.csv``/``.xlsx``),
:23 (``key.split("/")[1]`` dataset routing);
glue_jobs/archive_and_mark_processed.py:34 (``os.path.basename``).

All JVM-side builtins — these run inside whole-stage codegen, no UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def is_ingestible_path(
    col: Column | str,
    prefix: str = "raw/",
    suffixes: Sequence[str] = (".csv", ".xlsx"),
) -> Column:
    """The trigger Lambda's routing predicate (lambda_function.py:17)."""
    c = F.col(col) if isinstance(col, str) else col
    preds = [c.endswith(s) for s in suffixes]
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return c.startswith(prefix) & out


def path_segment(col: Column | str, index: int, sep: str = "/") -> Column:
    """``key.split(sep)[index]`` — dataset routing (lambda_function.py:23).
    ``element_at`` is 1-based; callers pass the 0-based reference index."""
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(F.split(c, sep), index + 1)


def basename(col: Column | str) -> Column:
    """``os.path.basename`` equivalent (archive_and_mark_processed.py:34)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(F.split(c, "/"), -1)
