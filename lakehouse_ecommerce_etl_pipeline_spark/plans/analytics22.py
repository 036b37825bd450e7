"""Analytics tier XXII: interval sweep-line and set-similarity join.

New shapes over I-XXI: maximum-concurrency via the sweep-line (+1/-1
running sum over session interval endpoints — the "how many sessions
were open at once" operator behind capacity planning), and an exact
set-similarity self-join accelerated by PPJoin-style prefix filtering
(Bayardo/Xiao): candidates are generated only from each record's
rarest tokens, and because the filter is LOSSLESS the DuckDB oracle
is the plain brute-force all-pairs Jaccard join — the gate itself
proves no qualifying pair was pruned (same oracle discipline as
q_bloom_prefilter_join).

Cross-engine exactness: endpoints ordered by (epoch-micros, delta)
BIGINTs; per-hour MAX of a prefix sum is permutation-independent
within equal-(t,delta) tie groups because all deltas in a group are
equal; Jaccard thresholds are integer-rewritten (J >= 1/2 iff
3·|A∩B| >= |A|+|B|) and the output ratio is one IEEE division of
exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_ecommerce_etl_pipeline_spark.llm.dedup import tokens
from lakehouse_ecommerce_etl_pipeline_spark.operators.windows import sessionize
from lakehouse_ecommerce_etl_pipeline_spark.plans._helpers import load
from lakehouse_ecommerce_etl_pipeline_spark.plans.llm import _tok_cte
from lakehouse_ecommerce_etl_pipeline_spark.plans.registry import register

# ------------------------------------------------- sweep-line


@register(
    "q_concurrency_sweep",
    oracle="""
    WITH flags AS (
      SELECT user_id, event_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                   OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flags
    ),
    iv AS (
      SELECT user_id, sid,
             MIN(epoch_us(ts)) AS st, MAX(epoch_us(ts)) AS en
      FROM sess GROUP BY user_id, sid
    ),
    sweep AS (
      SELECT st AS t, 1 AS d FROM iv
      UNION ALL
      SELECT en AS t, -1 AS d FROM iv
    ),
    run AS (
      SELECT t, d,
             SUM(d) OVER (ORDER BY t, d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      FROM sweep
    )
    SELECT t // 3600000000 AS hour_idx,
           CAST(MAX(conc) AS BIGINT) AS max_concurrency
    FROM run GROUP BY 1
    """,
)
def q_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour maximum number of concurrently-open user sessions:
    sessionize (30-min gap, same convention as q_sessionize), reduce
    each session to a [start,end) micros interval, explode into
    +1/-1 endpoint deltas, running-sum the global (t, delta) order,
    MAX per hour. Half-open convention: the -1 sorts before the +1
    at the same instant, so zero-length (single-event) sessions never
    count. Per-hour MAX is deterministic even with endpoint ties —
    within an equal-(t,delta) group all deltas are equal, so the set
    of prefix values is permutation-independent.

    PRODUCTION PLAN: the sweep runs the boundary-cut parallel prefix
    sum (operators/ranks.py with_global_running_sum) — endpoint-time
    cuts become plan literals, per-bucket local running sums, literal
    cumulative delta offsets; no single-partition window even at the
    endpoint grain (2x sessions, ~1000x smaller than events).  The
    per-hour MAX stays tie-invariant exactly as with the window form;
    twin pytest-pinned equal, oracle unchanged."""
    from lakehouse_ecommerce_etl_pipeline_spark.operators.ranks import (
        with_global_running_sum,
    )

    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    sess = sessionize(ev, "user_id", "ts", 1800, order_tiebreak=["event_id"])
    iv = (
        sess.withColumn("tus", F.expr("unix_micros(ts)"))
        .groupBy("user_id", "session_id")
        .agg(F.min("tus").alias("st"), F.max("tus").alias("en"))
    )
    sweep = iv.select(F.col("st").alias("t"), F.lit(1).alias("d")).unionByName(
        iv.select(F.col("en").alias("t"), F.lit(-1).alias("d"))
    )
    run = with_global_running_sum(
        sweep, ["t", "d"], primary="t", value_col="d", alias="conc"
    )
    return (
        run.groupBy(F.expr("t div 3600000000").alias("hour_idx"))
        .agg(F.max("conc").cast("long").alias("max_concurrency"))
    )


def q_concurrency_sweep_window_form(spark: SparkSession, sf_dir: str):
    """Running-sum oracle-exactness twin (former production plan),
    pytest-pinned equal to the boundary-cut prefix sum."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    sess = sessionize(ev, "user_id", "ts", 1800, order_tiebreak=["event_id"])
    iv = (
        sess.withColumn("tus", F.expr("unix_micros(ts)"))
        .groupBy("user_id", "session_id")
        .agg(F.min("tus").alias("st"), F.max("tus").alias("en"))
    )
    sweep = iv.select(F.col("st").alias("t"), F.lit(1).alias("d")).unionByName(
        iv.select(F.col("en").alias("t"), F.lit(-1).alias("d"))
    )
    w = Window.orderBy("t", "d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = sweep.withColumn("conc", F.sum("d").over(w))
    return (
        run.groupBy(F.expr("t div 3600000000").alias("hour_idx"))
        .agg(F.max("conc").cast("long").alias("max_concurrency"))
    )


# ------------------------------------------------- prefix-filter join

_SIM_DOCS = 200  # bounded measurement corpus (templated docs explode pairs)

# vocab rows below which the df-rank table broadcasts back onto the
# token stream; above it (web-scale vocabularies) the join
# shuffle-hashes instead — the rank pass's own counts collect supplies
# the driver-known size for free (PageRank dual-plan pattern).
_SETSIM_BCAST_MAX_VOCAB = 1_000_000


@register(
    "q_setsim_prefix_join",
    oracle=f"""
    WITH {_tok_cte(f"WHERE doc_id < {_SIM_DOCS}")},
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.id_a, i.id_b,
           i.i AS inter_sz,
           sa.sz + sb.sz - i.i AS union_sz,
           CAST(i.i AS DOUBLE) / CAST(sa.sz + sb.sz - i.i AS DOUBLE)
             AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE 3 * i.i >= sa.sz + sb.sz
    """,
)
def q_setsim_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set similarity self-join (Jaccard >= 0.5) with
    PPJoin-style prefix filtering: tokens are globally ordered by
    ascending document frequency; each doc exposes only its
    L = |d| - ceil(0.5|d|) + 1 RAREST tokens as join keys; two docs
    can reach J >= 0.5 only if their prefixes share a token (the
    prefix-filtering lemma), so the candidate join fans out on rare
    tokens instead of the whole inverted index. Candidates are then
    verified with the exact intersection count and the integer
    threshold 3·i >= |A|+|B| (== J >= 1/2, no float epsilon).

    The oracle is the UNFILTERED brute-force all-pairs join — a
    hash-match proves the prune lost nothing (the same "oracle ==
    unoptimized twin" discipline as q_bloom_prefilter_join).

    100 TB: brute force is quadratic in the posting length of every
    common token; prefix filtering bounds each posting to rare tokens
    (the frequent-token postings — exactly the skewed ones — never
    join). VERDICT r7 de-risked the vocabulary machinery: the global
    df-rank runs on the boundary-cut primitive (web-scale vocab is
    10^7+, so the former unpartitioned row_number was a
    single-partition sort), and the rank join back onto the token
    stream is SIZE-GATED on the vocab count the rank pass already
    collected (the PageRank dual-plan pattern) — broadcast below
    _SETSIM_BCAST_MAX_VOCAB, shuffle-hash join above it.  The rank
    ORDER tie-breaks by a numeric token hash before the token itself:
    any consistent total order satisfies the prefix-filtering lemma
    (the verified output is order-invariant — only candidate counts
    move), and a numeric secondary is what lets the tie-class
    auto-split balance the huge df=1 class at real vocab sizes.
    Bounded here to a measurement corpus: the synthetic docs are
    heavily templated, so unbounded all-pairs would square. Cites
    reference parity: SURVEY.md §M4 near-dup tier; complements
    q_lsh_candidates (approximate) with an exact lossless path."""
    import os as _os

    from lakehouse_ecommerce_etl_pipeline_spark.operators.ranks import (
        _global_row_number_with_total,
    )

    docs = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _SIM_DOCS
    )
    tok = tokens(docs, "doc_id", "text")  # distinct (id, tok) pairs
    dfreq = tok.groupBy("tok").agg(
        F.count(F.lit(1)).alias("df")
    ).withColumn("__h", F.xxhash64("tok"))
    ranked_vocab, n_vocab = _global_row_number_with_total(
        dfreq, [F.col("df"), F.col("__h"), "tok"], primary="df",
        descending=False, rn="rk", n_buckets=64, secondary="__h",
    )
    rk = ranked_vocab.select("tok", "rk")
    max_vocab = int(
        _os.environ.get(
            "SPARK_GRAFT_SETSIM_MAX_BCAST_VOCAB", _SETSIM_BCAST_MAX_VOCAB
        )
    )
    rk_side = F.broadcast(rk) if n_vocab <= max_vocab else rk.hint(
        "shuffle_hash"
    )
    sz = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    ranked = (
        tok.join(rk_side, "tok")
        .join(F.broadcast(sz), "doc_id")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("rk")
            ),
        )
    )
    # L = sz - ceil(sz/2) + 1, all-integer
    prefix = ranked.filter(
        F.col("pos")
        <= F.col("sz") - F.expr("(sz + 1) div 2") + 1
    ).select("doc_id", "rk")
    ca = prefix.select(F.col("doc_id").alias("id_a"), "rk")
    cb = prefix.select(F.col("doc_id").alias("id_b"), "rk")
    cand = (
        ca.join(cb, "rk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ta = tok.select(F.col("doc_id").alias("id_a"), F.col("tok").alias("t"))
    tb = tok.select(F.col("doc_id").alias("id_b"), F.col("tok").alias("t"))
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "t"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sz.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sa"))
    sb = sz.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sb"))
    return (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .filter(3 * F.col("i") >= F.col("sa") + F.col("sb"))
        .select(
            "id_a",
            "id_b",
            F.col("i").alias("inter_sz"),
            (F.col("sa") + F.col("sb") - F.col("i")).alias("union_sz"),
            (
                F.col("i").cast("double")
                / (F.col("sa") + F.col("sb") - F.col("i")).cast("double")
            ).alias("jaccard"),
        )
    )
