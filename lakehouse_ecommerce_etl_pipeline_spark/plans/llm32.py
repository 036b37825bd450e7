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


@register(
    "q_dpo_pairs",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, lang,
             CAST(n_chars AS BIGINT) AS n_chars,
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
               AS DOUBLE) / 3.0 AS quality
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, lang, quality,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY quality DESC, n_chars DESC, doc_id) AS r_top,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY quality ASC, n_chars ASC, doc_id) AS r_bot
      FROM q
    )
    SELECT t.lang,
           t.doc_id AS chosen_id, b.doc_id AS rejected_id,
           t.quality - b.quality AS margin
    FROM ranked t JOIN ranked b
      ON t.lang = b.lang AND t.r_top = b.r_bot AND t.r_top <= 5
    WHERE t.doc_id <> b.doc_id
    """,
)
def q_dpo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair assembly (DPO/RLHF-style data prep): per
    language, the top-5 quality documents pair positionally with the
    bottom-5 (rank i best ↔ rank i worst) as (chosen, rejected,
    quality margin) — the deterministic stand-in for
    human-preference pairing, built entirely from the corpus's own
    quality signal under TOTAL orders (quality, size, id) so both
    engines elect identical pairs. Degenerate self-pairs (a lang
    bucket smaller than 2) are excluded on the same predicate.

    100 TB: two per-lang rank windows (WindowGroupLimit prunes to 5
    per partition pre-exchange) and one 5-row-per-lang positional
    join — the pairing cost is dimension-sized, not corpus-sized."""
    from lakehouse_ecommerce_etl_pipeline_spark.functions.text import (
        quality_score,
    )
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        quality_score("text").alias("quality"),
    )
    top_w = Window.partitionBy("lang").orderBy(
        F.col("quality").desc(), F.col("n_chars").desc(), "doc_id"
    )
    bot_w = Window.partitionBy("lang").orderBy(
        F.col("quality").asc(), F.col("n_chars").asc(), "doc_id"
    )
    ranked = q.select(
        "doc_id",
        "lang",
        "quality",
        F.row_number().over(top_w).alias("r_top"),
        F.row_number().over(bot_w).alias("r_bot"),
    )
    t = ranked.select(
        "lang",
        F.col("doc_id").alias("chosen_id"),
        F.col("quality").alias("q_top"),
        F.col("r_top").alias("r"),
    ).filter(F.col("r") <= 5)
    b = ranked.select(
        F.col("lang").alias("lang_b"),
        F.col("doc_id").alias("rejected_id"),
        F.col("quality").alias("q_bot"),
        F.col("r_bot").alias("r_b"),
    )
    return (
        t.join(b, (F.col("lang") == F.col("lang_b")) & (F.col("r") == F.col("r_b")))
        .filter(F.col("chosen_id") != F.col("rejected_id"))
        .select(
            "lang",
            "chosen_id",
            "rejected_id",
            (F.col("q_top") - F.col("q_bot")).alias("margin"),
        )
    )


_MIX_BUDGET = 100_000  # target corpus size in tokens


@register(
    "q_token_budget_mixture",
    oracle=f"""
    WITH tk AS (
      SELECT source, CAST(SUM({_NTOK}) AS BIGINT) AS avail_tokens
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, avail_tokens,
             1 + (CAST(substr(source, 4) AS BIGINT) % 5) AS weight
      FROM tk
    ),
    s AS (SELECT SUM(weight) AS sumw FROM w)
    SELECT source, avail_tokens,
           CAST(weight AS BIGINT) AS weight,
           CAST(({_MIX_BUDGET} * weight) // s.sumw AS BIGINT)
             AS target_tokens,
           CAST(LEAST(({_MIX_BUDGET} * weight) // s.sumw, avail_tokens)
                AS BIGINT) AS planned_tokens,
           (avail_tokens < ({_MIX_BUDGET} * weight) // s.sumw)
             AS undersupplied
    FROM w CROSS JOIN s
    """,
)
def q_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture planning — the allocation table a
    pretraining run is configured from: per source, available tokens
    (whitespace count, the portable proxy), a deterministic weight
    (1..5 from the source id), the integer target share of a fixed
    token budget (budget·w ÷ Σw — integer division),
    the availability-capped plan, and the undersupply flag that tells
    the data team which source needs more crawling or upsampling.
    Pure integer arithmetic over a source-grain aggregate — the
    decision artifact q_source_mixture_sample then EXECUTES row-wise.

    100 TB: one partial-aggregable token-count rollup to source grain
    (a handful of rows); the plan itself is metadata-sized."""
    docs = load(spark, sf_dir, "documents")
    ntok = F.expr(
        "CASE WHEN length(regexp_replace(trim(text), '\\\\s+', ' ')) = 0 THEN 0"
        " ELSE length(regexp_replace(trim(text), '\\\\s+', ' '))"
        " - length(replace(regexp_replace(trim(text), '\\\\s+', ' '), ' ', ''))"
        " + 1 END"
    )
    tk = docs.groupBy("source").agg(
        F.sum(ntok).cast("bigint").alias("avail_tokens")
    )
    w = tk.withColumn(
        "weight",
        (1 + F.substring("source", 4, 10).cast("bigint") % 5).cast("bigint"),
    )
    sumw = w.agg(F.sum("weight").alias("sumw"))
    return (
        w.crossJoin(F.broadcast(sumw))
        .withColumn(
            "target_tokens", F.expr(f"({_MIX_BUDGET}L * weight) div sumw")
        )
        .withColumn(
            "planned_tokens",
            F.least(F.col("target_tokens"), F.col("avail_tokens")),
        )
        .withColumn(
            "undersupplied", F.col("avail_tokens") < F.col("target_tokens")
        )
        .drop("sumw")
    )
