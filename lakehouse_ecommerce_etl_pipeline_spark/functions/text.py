"""Text-analysis functions over the ``documents`` table (extension
tier: language-ID, quality scoring, token counting, fingerprinting).

All JVM-side builtins (length/replace/regexp/md5) — the hot path stays
inside whole-stage codegen; there is no Python UDF here. Formulas are
chosen to be expressible identically in ANSI SQL so every operator is
oracle-checkable (see plans/llm.py).

100 TB: each function is a narrow per-row projection — no shuffle, and
parquet column pruning means only ``text`` is read. Fingerprints and
quality scores are the cheap pre-filters that run BEFORE expensive
near-dup joins (llm/minhash.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Deterministic scoring formula (ties break by language name) — the
# quality of the lexicon is orthogonal to the operator's plumbing.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "with", "fast"],
    "de": ["der", "und", "nicht", "das", "mit"],
    "es": ["el", "la", "que", "los", "con"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["de", "shi", "bu", "le", "wo"],
}


def n_chars(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def n_tokens(col: Column | str) -> Column:
    """Whitespace token count.

    Computed as space-count + 1 on the single-spaced normalization of
    the trimmed string — pure length/replace arithmetic, identical in
    any SQL engine (no regex-split trailing-empty divergence).
    """
    c = F.col(col) if isinstance(col, str) else col
    t = F.regexp_replace(F.trim(c), r"\s+", " ")
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
    )


def avg_token_len(col: Column | str) -> Column:
    """Mean token length = non-space chars / tokens (double division of
    exact ints — engine-portable)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.regexp_replace(F.trim(c), r"\s+", " ")
    non_space = F.length(F.replace(t, F.lit(" "), F.lit("")))
    return F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
        non_space.cast("double") / n_tokens(c).cast("double")
    )


def punct_ratio(col: Column | str) -> Column:
    """Fraction of chars that are ASCII punctuation (quality signal)."""
    c = F.col(col) if isinstance(col, str) else col
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[!-/:-@\[-`{-~]", ""))
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        punct.cast("double") / F.length(c).cast("double")
    )


def quality_score(col: Column | str) -> Column:
    """Composite heuristic quality score in [0,1]: length band + low
    punctuation + sane mean token length. Deterministic arithmetic on
    exact ints (engine-portable)."""
    c = F.col(col) if isinstance(col, str) else col
    len_ok = (F.length(c) >= 20) & (F.length(c) <= 100000)
    punct_ok = punct_ratio(c) < 0.2
    tok = avg_token_len(c)
    tok_ok = (tok >= 2.0) & (tok <= 12.0)
    return (
        len_ok.cast("int") + punct_ok.cast("int") + tok_ok.cast("int")
    ).cast("double") / F.lit(3.0)


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse
    whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint = md5 of the normalized text (32-hex).

    md5 is available and identical in Spark and DuckDB, making the
    fingerprint oracle-checkable; swap for xxhash64 when cross-engine
    parity is not needed (faster, no crypto).
    """
    return F.md5(normalize_text(col))


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language marker-hit counts on the tokenized text.

    Counts occurrences of each marker as a standalone token via
    space-padded LIKE arithmetic (engine-portable; no regex lookaround).
    """
    padded = F.concat(F.lit(" "), normalize_text(col), F.lit(" "))
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        s = F.lit(0)
        for m in markers:
            token = f" {m} "
            occurrences = (
                F.length(padded)
                - F.length(F.replace(padded, F.lit(token), F.lit("")))
            ) / len(token)
            s = s + occurrences.cast("int")
        scores[lang] = s
    return scores


def lang_id(col: Column | str, default: str = "und") -> Column:
    """Argmax language over ``lang_scores``; ties break alphabetically
    (first language whose score >= all others wins); ``und`` when no
    marker hits at all. Implemented as a CASE chain so the exact same
    expression is writable in ANSI SQL for the oracle."""
    scores = lang_scores(col)
    langs = sorted(scores)
    total = None
    for s in scores.values():
        total = s if total is None else total + s
    expr = F.when(total == 0, F.lit(default))
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else cond & c
        expr = expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit(default))
