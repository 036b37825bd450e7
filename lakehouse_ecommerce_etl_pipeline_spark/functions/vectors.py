"""Vector math over ``array<float>`` embedding columns — all JVM-side.

Built from ``zip_with``/``aggregate`` higher-order functions: the fold
runs inside codegen on the executor, no Python crosses the boundary.
Element order within an array is fixed, so left-to-right double folds
are deterministic and engine-portable (same sequence of IEEE adds).

100 TB: brute-force similarity is O(n·d) per query vector and
embarrassingly parallel; the scale path is IVF/LSH bucketing
(llm/similarity.py) which prunes candidates before the exact fold.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ as a codegen'd fold (cast to double first)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    prod = F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    """L2 norm."""
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity.  Zero-norm inputs yield NULL (undefined
    angle) via try_divide — under Spark's default ANSI mode a plain
    division would THROW DIVIDE_BY_ZERO on the first all-zero vector,
    and NULL is the semantics every consumer wants anyway: a NULL
    similarity never crosses a threshold filter and sorts last in
    top-k descents, so undefined-cosine vectors never pair and never
    rank.  For non-zero norms try_divide is the identical IEEE
    division (bit-stable vs the oracle)."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def lit_vector(vec: Sequence[float]) -> Column:
    """A literal query vector as array<double>."""
    return F.array(*[F.lit(float(x)) for x in vec])
