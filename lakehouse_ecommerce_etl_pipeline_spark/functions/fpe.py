"""Format-preserving pseudonymization: a 4-round balanced Feistel
permutation over 48-bit keys (24|24 split), round function = md5 —
the keyed-tokenization primitive a privacy-preserving training
pipeline uses to replace user/customer ids CONSISTENTLY (the same id
always maps to the same pseudonym, so joins and per-user aggregates
still work) while the mapping stays secret-keyed and INVERTIBLE for
authorized re-identification.

Why Feistel: it is a bijection on the domain by construction — no
collisions ever, unlike hashing — and the inverse is the same network
with the round order reversed. md5 as the round function keeps the
whole permutation expressible in BOTH engines (Spark conv(md5..) and
DuckDB CAST('0x'|| md5..)), which is what lets the driver value-check
a cryptographic-shaped transform. (Production would swap md5 for
HMAC-SHA256/AES — same network, same plan shape; NIST FF1/FF3 are
exactly this construction plus cycle-walking for non-2^n domains.)

100 TB: a pure in-row projection — no shuffle, no UDF, whole-stage
codegen'd md5/concat/xor per round.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BITS = 24
_MASK = (1 << _BITS) - 1  # 16777215
ROUNDS = 4


def _f(half: Column, rnd: int, tweak: str) -> Column:
    """Round function: low 24 bits of md5('fpe:<tweak>:<round>:<half>')."""
    digest = F.md5(
        F.concat(
            F.lit(f"fpe:{tweak}:{rnd}:"), half.cast("string")
        )
    )
    return F.conv(F.substring(digest, 1, 6), 16, 10).cast("long")


def pseudonymize48(key: Column, tweak: str = "k1") -> Column:
    """Feistel-encrypt a BIGINT in [0, 2^48) to its pseudonym."""
    k = key.cast("long")
    left = F.shiftright(k, _BITS)
    right = k.bitwiseAND(F.lit(_MASK))
    for rnd in range(1, ROUNDS + 1):
        left, right = right, left.bitwiseXOR(_f(right, rnd, tweak))
    return (F.shiftleft(left, _BITS) + right).alias("pseudo")


def depseudonymize48(pseudo: Column, tweak: str = "k1") -> Column:
    """Inverse permutation: same network, rounds reversed."""
    p = pseudo.cast("long")
    left = F.shiftright(p, _BITS)
    right = p.bitwiseAND(F.lit(_MASK))
    for rnd in range(ROUNDS, 0, -1):
        left, right = right.bitwiseXOR(_f(left, rnd, tweak)), left
    return (F.shiftleft(left, _BITS) + right).alias("key")


def pseudonymize48_sql(expr: str, tweak: str = "k1") -> str:
    """The identical permutation as a DuckDB SQL scalar expression."""
    left = f"(({expr}) >> {_BITS})"
    right = f"(({expr}) & {_MASK})"
    for rnd in range(1, ROUNDS + 1):
        f_r = (
            f"CAST('0x' || substr(md5('fpe:{tweak}:{rnd}:' ||"
            f" CAST({right} AS VARCHAR)), 1, 6) AS BIGINT)"
        )
        left, right = right, f"xor({left}, {f_r})"
    return f"(({left}) << {_BITS}) + ({right})"
