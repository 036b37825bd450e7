"""Analytics tier XLIV: model-evaluation and quality-gate statistics.

New shapes over I-XLIII: a rank-statistic model metric (ROC AUC via
the Mann-Whitney U with tie-averaged ranks), an impurity measure over
categorical mixes (Gini), a deterministic k-fold cross-validation
assignment with a class-balance audit, a dyadic-weighted truncated
EWMA built from composed lag taps, and a corpus bigram-novelty score
(the phrase-level complement of the document-level dedup family).

Cross-engine exactness: every statistic is accumulated in integer or
decimal space (rank sums, squared counts, scaled dyadic weights) and
any ratio is a SINGLE final division of identical operands — IEEE
division of equal doubles is correctly rounded on both engines, so
hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

_K_FOLDS = 5
_EWMA_TAPS = 8


@register(
    "q_rank_auc",
    oracle="""
    WITH r AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos,
             RANK() OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice) AS rk,
             COUNT(*) OVER (PARTITION BY o_orderpriority, o_totalprice)
               AS ties
      FROM orders
    ),
    g AS (
      SELECT o_orderpriority,
             CAST(SUM(CASE WHEN pos = 1
                           THEN 2 * rk + ties - 1 ELSE 0 END) AS BIGINT)
               AS s2,
             CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(SUM(1 - pos) AS BIGINT) AS n_neg
      FROM r GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n_pos, n_neg,
           CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
             / CAST(2 * n_pos * n_neg AS DOUBLE) AS auc
    FROM g
    WHERE n_pos > 0 AND n_neg > 0
    """,
)
def q_rank_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of ``o_totalprice`` as a score predicting fulfilled
    status, per order priority — the Mann-Whitney U formulation with
    tie-averaged ranks, which is how AUC is actually computed on a
    relational engine (no curve materialization).  Doubling the
    average-rank sum keeps it integral:
    ``2*avg_rank = 2*min_rank + ties - 1``, so
    ``AUC = (S2 - P(P+1)) / (2 P N)`` is one division of exact
    integers.

    100 TB: one rank window per class-score partition (a sort-based
    shuffle on the partition key) then a partial-aggregated group-by;
    no joins, no driver state.  This is the evaluation-side twin of
    the training-side split/packing tier — a model-quality metric
    computed where the predictions live instead of collecting them.
    The rank-sum S2 ≤ 2n² and the n_pos·n_neg products run on
    DECIMAL(38,0) (the q_ks_drift discipline): int64 would throw
    under ANSI at ~2.1e9 rows per segment; the decimals are the
    identical integers below the bound and decimal→double rounds to
    the same nearest double, so the released AUC is bit-equal on both
    paths — and the cost disappears under the rank window that
    dominates this plan.  The PER-ROW term widens BEFORE any
    arithmetic: ``2·rk`` on rank()'s raw IntegerType output would
    throw int32 overflow at ~1.07e9 rows per segment, long before the
    int64 bound the sum protects (rank() itself emits int32, so the
    window form's own ceiling is 2^31 rows per partition — at which
    point the per-segment sort, not the rank dtype, is the real
    problem; the bound is Spark's, documented here)."""
    dec = "decimal(38,0)"
    w_rank = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    w_ties = Window.partitionBy("o_orderpriority", "o_totalprice")
    r = load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("pos"),
        F.rank().over(w_rank).cast("long").alias("rk"),
        F.count(F.lit(1)).over(w_ties).alias("ties"),
    )
    g = r.groupBy("o_orderpriority").agg(
        F.sum(
            F.when(
                F.col("pos") == 1,
                (
                    2 * F.col("rk").cast(dec)
                    + F.col("ties").cast(dec)
                    - 1
                ).cast(dec),
            ).otherwise(F.lit(0).cast(dec))
        ).cast(dec).alias("s2"),
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(1 - F.col("pos")).cast("bigint").alias("n_neg"),
    )
    np_d = F.col("n_pos").cast(dec)
    nn_d = F.col("n_neg").cast(dec)
    return g.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0)).select(
        "o_orderpriority",
        "n_pos",
        "n_neg",
        (
            (F.col("s2") - np_d * (np_d + F.lit(1).cast(dec))).cast("double")
            / (F.lit(2).cast(dec) * np_d * nn_d).cast("double")
        ).alias("auc"),
    )


@register(
    "q_gini_impurity",
    oracle="""
    WITH c AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt
      FROM customer GROUP BY c_nationkey, c_mktsegment
    ),
    g AS (
      SELECT c_nationkey,
             CAST(SUM(cnt) AS BIGINT) AS n_customers,
             CAST(SUM(cnt * cnt) AS BIGINT) AS sum_sq
      FROM c GROUP BY c_nationkey
    )
    SELECT n.n_name, g.n_customers,
           CAST(g.n_customers * g.n_customers - g.sum_sq AS DOUBLE)
             / CAST(g.n_customers * g.n_customers AS DOUBLE)
             AS gini_impurity
    FROM g JOIN nation n ON n.n_nationkey = g.c_nationkey
    """,
)
def q_gini_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini impurity of each nation's customer market-segment mix —
    ``1 - sum(p_i^2)`` computed as ``(n^2 - sum(c_i^2)) / n^2`` so the
    whole statistic is integer arithmetic until one final division.
    The impurity form of diversity needs no logarithm, unlike Shannon
    entropy, which keeps it bit-reproducible across engines.

    100 TB: two cascaded partial-aggregated group-bys (segment counts,
    then squared-count sums) and a broadcast join to the 25-row nation
    dim; the wide fact never moves twice.  The squares c² and n² run
    on DECIMAL(38,0) (the q_ks_drift discipline): int64 throws under
    ANSI at ~3e9 customers per nation; the (nation × segment) grid is
    tiny, so widening is free, and decimal→double rounds to the same
    nearest double — bit-equal release."""
    dec = "decimal(38,0)"
    c = (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    g = c.groupBy("c_nationkey").agg(
        F.sum("cnt").cast("bigint").alias("n_customers"),
        F.sum(F.col("cnt").cast(dec) * F.col("cnt").cast(dec))
        .cast(dec)
        .alias("sum_sq"),
    )
    nation = load(spark, sf_dir, "nation")
    n_sq = F.col("n_customers").cast(dec) * F.col("n_customers").cast(dec)
    return g.join(
        F.broadcast(nation), g["c_nationkey"] == nation["n_nationkey"]
    ).select(
        "n_name",
        "n_customers",
        ((n_sq - F.col("sum_sq")).cast("double") / n_sq.cast("double")).alias(
            "gini_impurity"
        ),
    )


@register(
    "q_kfold_assign",
    oracle=f"""
    WITH f AS (
      SELECT CAST(
               CAST(CONCAT('0x', substring(
                 md5('fold:' || CAST(o_orderkey AS VARCHAR)), 1, 6))
                 AS BIGINT) % {_K_FOLDS} AS INT) AS fold,
             o_orderstatus, o_totalprice
      FROM orders
    )
    SELECT fold, COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_fulfilled,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS sum_price_cents
    FROM f GROUP BY fold
    """,
)
def q_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment with a
    per-fold class-balance audit: fold = salted-md5(key) mod k, the
    same engine-portable keyspace hash as the train/val split
    (q_split_train_val), so fold membership survives repartitioning,
    retries, and engine swaps — the property CV needs so no example
    ever changes folds between runs.  Output is the balance sheet a
    reviewer checks before trusting the CV estimate: fold sizes,
    positive-class counts, and exact price mass on the BIGINT
    integer-cents lattice (DESIGN §21, the q_ewma_taps precedent):
    prices snap to cents once at the scan (ROUND(x*100) — 2-dp-valued
    doubles are never near a .5 boundary at ×100, so HALF_UP and
    half-even agree) and the sum is exact int64 on BOTH engines; a
    bare double→DECIMAL cast inside SUM is engine-version-sensitive
    rounding (numeric-portability rule 3) and is exactly what made
    this row the driver's one red in CORRECTNESS_r10.

    100 TB: stateless hash projection (no shuffle to ASSIGN folds)
    plus one k-row partial-aggregated group-by; training then filters
    `fold <> i` per round — k scans, zero residual state."""
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("fold:"), F.col("o_orderkey").cast("string"))),
                1,
                6,
            ),
            16,
            10,
        )
        .cast("bigint")
        % _K_FOLDS
    ).cast("int")
    return (
        load(spark, sf_dir, "orders")
        .select(
            fold.alias("fold"),
            "o_orderstatus",
            "o_totalprice",
        )
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_fulfilled"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("sum_price_cents"),
        )
    )


@register(
    "q_ewma_taps",
    oracle=f"""
    WITH d AS (
      SELECT o_orderdate AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM orders GROUP BY o_orderdate
    )
    SELECT day, rev_cents,
           CAST(
             128 * rev_cents
             + 64 * COALESCE(LAG(rev_cents, 1) OVER w, 0)
             + 32 * COALESCE(LAG(rev_cents, 2) OVER w, 0)
             + 16 * COALESCE(LAG(rev_cents, 3) OVER w, 0)
             + 8 * COALESCE(LAG(rev_cents, 4) OVER w, 0)
             + 4 * COALESCE(LAG(rev_cents, 5) OVER w, 0)
             + 2 * COALESCE(LAG(rev_cents, 6) OVER w, 0)
             + 1 * COALESCE(LAG(rev_cents, 7) OVER w, 0)
             AS BIGINT) AS ewma_cents_x256
    FROM d
    WINDOW w AS (ORDER BY day)
    """,
)
def q_ewma_taps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated exponentially-weighted moving average of daily
    revenue, alpha = 1/2, {_EWMA_TAPS} taps — the recursive EWMA
    unrolled into composed LAG taps with DYADIC integer weights
    (128,64,...,1 = 2^8 * 2^-(k+1)).  The whole FIR runs on the
    BIGINT integer-cents lattice (DESIGN §21 / the
    plans/analytics16.py PageRank precedent): each price is snapped
    to cents ONCE at the scan (ROUND(x*100) is never within 1e-4 of
    a .5 boundary for 2-dp-valued doubles, so HALF_UP vs half-even
    agree), and every downstream sum/product is exact int64
    arithmetic — no DECIMAL typing rules, no double accumulation, on
    EITHER engine.  Max tap sum ≈ 255 × max daily cents ≈ 3e12 ≪
    2^63.  The 2^8 scale is folded out by the reader (documented in
    the column name), never divided in-engine.  Missing taps at the
    series head contribute zero (the standard zero-padded FIR
    convention).

    100 TB: the daily series is one partial-aggregated group-by (at
    most ~2.5k rows/decade), then a single ordered window over that
    TINY aggregate — the window's single-partition sort is over the
    aggregated series, never the fact table.  This is the general
    pattern for any FIR filter on an aggregate timeline: aggregate
    first, filter second."""
    d = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("rev_cents")
        )
    )
    w = Window.orderBy("day")
    taps = sum(
        (
            F.lit(2 ** (_EWMA_TAPS - 1 - k))
            * F.coalesce(F.lag("rev_cents", k).over(w), F.lit(0))
            for k in range(1, _EWMA_TAPS)
        ),
        F.lit(128) * F.col("rev_cents"),
    )
    return d.select(
        "day",
        "rev_cents",
        taps.cast("bigint").alias("ewma_cents_x256"),
    )


@register(
    "q_bigram_novelty",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS l FROM documents
    ),
    bi AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(l) - 1),
                                   i -> l[i] || ' ' || l[i + 1])) AS bigram
      FROM toks WHERE len(l) >= 2
    ),
    corpus AS (
      SELECT bigram, COUNT(DISTINCT doc_id) AS n_docs
      FROM bi GROUP BY bigram
    )
    SELECT b.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_shared,
           CAST(SUM(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS shared_rate
    FROM bi b JOIN corpus c ON c.bigram = b.bigram
    GROUP BY b.doc_id
    """,
)
def q_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram novelty: the fraction of a document's
    adjacent word bigrams (multiset — repeats count) that also occur
    in at least one OTHER document.  A high shared-rate marks
    boilerplate/templated text; the phrase-level quality gate that
    complements document-level near-dup (q_near_dup_pairs) and
    intra-document repetition (q_repetition_score) in a training-data
    filter stack.

    100 TB: bigram expansion is codegen'd transform+explode (no
    Python); corpus document-frequency is a partial-aggregated
    group-by; the annotate-back step is one shuffle join on the
    bigram key — the same join profile as q_contamination_ngrams but
    with the corpus itself as the reference side, so no broadcast is
    assumed."""
    toks = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id", F.split(F.trim(F.col("text")), " ").alias("l")
        )
        .filter(F.size("l") >= 2)
    )
    bi = toks.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, size(l) - 2), i -> concat(l[i], ' ', l[i + 1]))")
        ).alias("bigram"),
    )
    corpus = bi.groupBy("bigram").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    shared = F.sum(
        F.when(F.col("n_docs") >= 2, 1).otherwise(0)
    ).cast("bigint")
    return (
        bi.join(corpus, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            shared.alias("n_shared"),
            (
                shared.cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("shared_rate"),
        )
    )
