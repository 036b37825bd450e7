"""LLM tier XXXII: the per-document curation FEATURE TABLE — the
wide artifact a production pipeline actually materializes before any
keep/drop policy runs: every quality/dedup signal the engine computes,
joined to document grain in one pass, so downstream policies (gates,
mixtures, splits) are cheap column predicates instead of re-derived
chains.

Signals: language, size, composite heuristic quality (length band +
punctuation + token shape), Flesch readability, bigram-LM
corpus-likeness (nanounit integer, NULL for sub-2-token docs), and
the exact-duplicate flag (normalized-md5 fingerprint multiplicity).
Every signal keeps its established float/integer discipline, so the
WHOLE row is value-oracled — the oracle replays each chain and the
join composition.

100 TB: each signal is its own already-scale-shaped plan (in-row
projections for quality/flesch/fingerprint; uniqueness-sized count
tables for the LM); the composition adds doc-grain equi-joins only —
at scale you'd bucket by doc_id once and every join co-locates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_T = "regexp_replace(trim(text), '\\s+', ' ', 'g')"
_NTOK = (
    f"CASE WHEN length({_T}) = 0 THEN 0 "
    f"ELSE length({_T}) - length(replace({_T}, ' ', '')) + 1 END"
)
_PUNCT_RE = r"[!-/:-@\[-`{-~]"
_LM_SCALE = 1_000_000_000


@register(
    "q_curation_features",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(
               CAST(length(text) BETWEEN 20 AND 100000 AS INTEGER)
             + CAST((CASE WHEN length(text) = 0 THEN 0.0
                  ELSE CAST(length(text)
                       - length(regexp_replace(text, '{_PUNCT_RE}', '', 'g'))
                       AS DOUBLE) / CAST(length(text) AS DOUBLE) END) < 0.2
                    AS INTEGER)
             + CAST((CASE WHEN length({_T}) = 0 THEN 0.0
                  ELSE CAST(length(replace({_T}, ' ', '')) AS DOUBLE)
                       / CAST({_NTOK} AS DOUBLE) END) BETWEEN 2.0 AND 12.0
                    AS INTEGER)
               AS DOUBLE) / 3.0 AS quality,
             md5({_NORM}) AS fp
      FROM documents
    ),
    fl AS (
      SELECT doc_id,
             206.835
             - 1.015 * (CAST(len(tk) AS DOUBLE)
                        / CAST(GREATEST(len(regexp_extract_all(text, '[.!?]')), 1)
                               AS DOUBLE))
             - 84.6 * (CAST(len(regexp_extract_all({_NORM}, '[aeiouy]+'))
                            + len(list_filter(tk,
                                  t -> NOT regexp_matches(t, '[aeiouy]')))
                            AS DOUBLE)
                       / CAST(len(tk) AS DOUBLE)) AS flesch
      FROM (SELECT doc_id, text,
                   list_filter(string_split({_NORM}, ' '), t -> t <> '') AS tk
            FROM documents)
      WHERE len(tk) > 0
    ),
    d AS (
      SELECT doc_id,
             list_filter(string_split({_NORM}, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    p AS (
      SELECT doc_id, unnest(toks) AS tok,
             unnest(range(1, length(toks) + 1)) AS pos
      FROM d
    ),
    bg AS (
      SELECT a.doc_id, a.tok AS w1, a.tok || '|' || b.tok AS big
      FROM p a JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ),
    c2 AS (SELECT big, COUNT(*) AS c2 FROM bg GROUP BY big),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
    v AS (SELECT COUNT(DISTINCT tok) AS v FROM p),
    lm AS (
      SELECT bg.doc_id,
             SUM(({_LM_SCALE} * (c2.c2 + 1)) // (c1.c1 + v.v))
             // COUNT(*) AS per_bigram_q
      FROM bg
      JOIN c2 ON c2.big = bg.big
      JOIN c1 ON c1.w1 = bg.w1
      CROSS JOIN v
      GROUP BY bg.doc_id
    ),
    fpc AS (SELECT fp, COUNT(*) AS n FROM q GROUP BY fp)
    SELECT q.doc_id, q.lang, q.n_chars, q.quality,
           fl.flesch,
           CAST(lm.per_bigram_q AS BIGINT) AS per_bigram_q,
           (fpc.n > 1) AS exact_dup
    FROM q
    LEFT JOIN fl ON fl.doc_id = q.doc_id
    LEFT JOIN lm ON lm.doc_id = q.doc_id
    JOIN fpc ON fpc.fp = q.fp
    """,
)
def q_curation_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per document with every curation signal joined in:
    (lang, n_chars, quality, flesch, per_bigram_q, exact_dup). NULLs
    are honest — flesch for empty docs, LM score for sub-2-token
    docs. Downstream keep/drop policies become column predicates on
    THIS table instead of re-running the chains per policy."""
    from lakehouse_ecommerce_etl_pipeline_spark.functions.text import (
        fingerprint,
        quality_score,
    )
    from lakehouse_ecommerce_etl_pipeline_spark.plans.llm16 import (
        q_lm_score_docs,
    )
    from lakehouse_ecommerce_etl_pipeline_spark.plans.llm31 import (
        q_readability,
    )

    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        quality_score("text").alias("quality"),
        fingerprint("text").alias("fp"),
    )
    flesch = q_readability(spark, sf_dir).select("doc_id", "flesch")
    lm = q_lm_score_docs(spark, sf_dir).select(
        "doc_id",
        F.expr("lm_score_q div n_bigrams").cast("bigint").alias("per_bigram_q"),
    )
    fpc = base.groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
    return (
        base.join(flesch, "doc_id", "left")
        .join(lm, "doc_id", "left")
        .join(fpc, "fp")
        .select(
            "doc_id",
            "lang",
            "n_chars",
            "quality",
            "flesch",
            "per_bigram_q",
            (F.col("n") > 1).alias("exact_dup"),
        )
    )


_SFT_MIN_P = 8  # prompt length varies 8..16 tokens by doc_id


@register(
    "q_sft_render",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split({_NORM}, ' '), t -> t <> '') AS tk,
             CAST({_SFT_MIN_P} + doc_id % 9 AS BIGINT) AS p
      FROM documents
    ),
    r AS (
      SELECT doc_id, p,
             CAST(len(tk) AS BIGINT) AS n_tokens,
             '<|user|> ' || array_to_string(tk[1:p], ' ')
             || ' <|assistant|> '
             || array_to_string(tk[p + 1:len(tk)], ' ') AS rendered
      FROM d WHERE len(tk) > p
    )
    SELECT doc_id, n_tokens,
           p AS prompt_tokens,
           p + 3 AS loss_start,
           n_tokens + 2 AS loss_end,
           md5(rendered) AS rendered_md5
    FROM r
    """,
)
def q_sft_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT example assembly — the data-prep step between curation and
    training: each document splits into a prompt (first 8..16 tokens,
    length varying deterministically by doc_id) and a response (the
    rest), rendered into a fixed chat template
    ``<|user|> … <|assistant|> …`` with the LOSS-MASK SPAN emitted in
    template-token coordinates (loss_start = prompt + both markers +
    1, loss_end = last response token) — the span a trainer uses to
    zero prompt-token loss. The rendered string is md5-pinned, so the
    oracle catches template drift, off-by-one splits, and separator
    changes byte-exactly; docs too short to hold a non-empty response
    are dropped on the same predicate in both engines.

    100 TB: pure in-row projection (split/slice/concat/md5) — the
    render adds zero shuffles; downstream packing (q_pack_sequences)
    consumes (doc, n_tokens) exactly as emitted here."""
    from lakehouse_ecommerce_etl_pipeline_spark.functions.text import (
        normalize_text,
    )

    docs = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(normalize_text("text"), " "), lambda t: t != "")
    p = (F.lit(_SFT_MIN_P) + F.col("doc_id") % 9).cast("bigint")
    d = docs.select(
        "doc_id", toks.alias("tk"), p.alias("p")
    ).filter(F.size("tk") > F.col("p"))
    rendered = F.concat(
        F.lit("<|user|> "),
        F.concat_ws(" ", F.slice("tk", 1, F.col("p").cast("int"))),
        F.lit(" <|assistant|> "),
        F.concat_ws(
            " ",
            F.slice(
                "tk",
                (F.col("p") + 1).cast("int"),
                (F.size("tk") - F.col("p").cast("int")),
            ),
        ),
    )
    return d.select(
        "doc_id",
        F.size("tk").cast("bigint").alias("n_tokens"),
        F.col("p").alias("prompt_tokens"),
        (F.col("p") + 3).alias("loss_start"),
        (F.size("tk") + 2).cast("bigint").alias("loss_end"),
        F.md5(rendered).alias("rendered_md5"),
    )
