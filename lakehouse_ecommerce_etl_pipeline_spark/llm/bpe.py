"""Distributed BPE (byte-pair-encoding) vocabulary training.

The real tokenizer-training loop, Spark-shaped: the corpus-scale work
(pair counting over every word occurrence) is a map-side-combined
aggregation, while the O(1)-size decision (which pair merges next)
round-trips through the driver — exactly the split a production
distributed BPE trainer makes (count in the cluster, decide centrally,
broadcast the merge back out).

Semantics: classic greedy BPE over whitespace words (Sennrich et al.
2016, public algorithm) — start from characters, repeatedly merge the
globally most frequent adjacent symbol pair (ties broken
lexicographically), rewriting each word left-to-right greedily. The
left-to-right fold matches the reference implementation's sequential
re-pairing on overlaps ("aaa" under (a,a) → ["aa","a"]).

100 TB: each round is ONE shuffle (pair counts over the deduped
word×count table — dedup first: pair counting is per distinct word,
weighted by occurrence count, so the working set is the vocabulary,
not the corpus); the symbol table is persisted per generation with the
previous generation dropped (the q_pagerank loop discipline), and the
merge decision is a top-1 of a tiny aggregated domain. Byte-level BPE
at corpus scale adds nothing structural — just a bigger alphabet.

reference: the reference has no tokenizer; this is north-star text
analysis (BASELINE.json) alongside q_bpe_token_count, which *applies*
a BPE-ish regex — this module *trains* the merge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _chars(col: str) -> F.Column:
    """Split a word into single-character symbols (JVM-side)."""
    return F.expr(
        f"transform(sequence(1, length({col})), i -> substring({col}, i, 1))"
    )


def _adjacent_pairs(sym_col: str) -> F.Column:
    """All adjacent symbol pairs of one word as an array of structs."""
    return F.expr(
        f"transform(sequence(1, size({sym_col}) - 1), "
        f"i -> struct(element_at({sym_col}, i) AS l, "
        f"element_at({sym_col}, i + 1) AS r))"
    )


def _merge_pair(sym: F.Column, left: str, right: str) -> F.Column:
    """Greedy left-to-right merge of (left, right) into one symbol via
    an array fold: append each symbol unless it completes the pair with
    the accumulator's tail, in which case replace the tail with the
    merged symbol. The fold's sequential order IS the greedy order."""
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _pairs_or_empty(col: str) -> F.Column:
    """``_adjacent_pairs`` with the size guard in-row: a 1-symbol word
    would make ``sequence(1, 0)`` generate DESCENDING [1, 0] and emit
    bogus pairs — return an empty pair array instead."""
    return F.when(
        F.expr(f"size({col})") >= 2, _adjacent_pairs(col)
    ).otherwise(F.expr("CAST(array() AS array<struct<l:string,r:string>>)"))


def _has_pair(sym_col: str, left: str, right: str) -> F.Column:
    """True iff the word contains the adjacent symbol pair — exactly
    the words the greedy fold changes (the FIRST occurrence of (l, r)
    always merges: a prior overlapping merge would require r == l and
    then the occurrence is itself merged)."""
    return F.exists(
        _pairs_or_empty(sym_col),
        lambda p: (p["l"] == F.lit(left)) & (p["r"] == F.lit(right)),
    )


def train_bpe(
    spark: SparkSession, docs: DataFrame, n_merges: int = 8
) -> list[dict]:
    """Train ``n_merges`` BPE merges over ``docs.text``; returns the
    merge table as a list of dicts (step, left, right, merged,
    pair_count) — deterministic for a fixed corpus.

    r13 optimization (VERDICT r12 item 4, guide §1.2 — fix the
    distributed algorithm first): rounds 2..n maintain the pair-count
    table by DELTA instead of a full per-generation recount.  Only
    words containing the merged pair change their adjacent-pair
    multiset, so each round (a) rewrites just those words (the fold is
    identity on the rest), and (b) updates the running count table
    with signed contributions (+wc for the rewritten word's pairs,
    −wc for its pre-rewrite pairs) — integer sums, so the maintained
    table is EXACTLY the full recount (pinned by tests/test_bpe.py
    against the pure-Python reference).  At 100 TB each round's
    shuffle shrinks from every pair of the vocabulary to the pairs of
    the affected words only (Zipf: the top pair concentrates in few
    distinct words).

    The count table itself lives in the DRIVER: its size is bounded
    by the SYMBOL ALPHABET squared — (initial chars + n_merges)² pairs
    at most, independent of corpus size — so it is a legitimate
    O(alphabet²) driver decision structure (the audited bounded-collect
    class), Python-int exact, and the per-round decision costs zero
    jobs.  Each round runs exactly TWO jobs: the next-generation
    checkpoint and the delta collect."""
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    # per-generation localCheckpoint, NOT persist+count: each round's
    # next generation references the previous one TWICE (the affected/
    # unaffected filter branches) and the count table thrice, so a
    # lazy-lineage chain doubles the logical plan per round — measured
    # ~4× slower Catalyst analysis per generation (exponential) before
    # the cut.  The checkpoint is the same per-round truncation the
    # connected-components loop uses (llm/components.py); blocks free
    # when the superseded generation's RDD is GC'd.
    syms = words.select("wc", _chars("word").alias("s")).localCheckpoint(
        eager=True
    )

    # full pair count ONCE (round 1's decision table, alphabet²-
    # bounded — see docstring); rounds 2..n maintain the dict from
    # collected deltas.  Python ints, so sums are exact; string
    # comparison for the tie-break is code-point order on both sides
    # (UTF-8 binary order in Spark is code-point-order-preserving).
    counts: dict[tuple[str, str], int] = {
        (row["l"], row["r"]): row["cnt"]
        for row in (
            syms.filter(F.size("s") >= 2)
            .select("wc", F.explode(_adjacent_pairs("s")).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("wc").alias("cnt"))
            .collect()
        )
    }

    merges: list[dict] = []
    for step in range(1, n_merges + 1):
        if not counts:
            break
        # max count, ties broken lexicographically on (l, r) — the
        # same total order as ORDER BY cnt DESC, l, r
        (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append(
            {
                "step": step,
                "left": l,
                "right": r,
                "merged": l + r,
                "pair_count": int(cnt),
            }
        )
        if step == n_merges:
            break  # the last decision needs no rewrite

        has = _has_pair("s", l, r)
        # affected words: old + new symbol arrays side by side (the
        # fold runs ONCE per affected word; persisted because both the
        # next generation and the delta read it — its own plan is
        # shallow, a filter over the checkpointed generation)
        aff = syms.filter(has).select(
            "wc",
            F.col("s").alias("s_old"),
            _merge_pair(F.col("s"), l, r).alias("s_new"),
        ).persist()
        nxt = (
            syms.filter(~has)
            .unionByName(aff.select("wc", F.col("s_new").alias("s")))
            .localCheckpoint(eager=True)  # materializes (and caches) aff
        )

        def _signed(col: str, sign: int) -> F.Column:
            return F.transform(
                _pairs_or_empty(col),
                lambda p: F.struct(
                    p["l"].alias("l"),
                    p["r"].alias("r"),
                    (F.col("wc") * F.lit(sign)).alias("d"),
                ),
            )

        delta_rows = (
            aff.select(
                F.explode(
                    F.concat(_signed("s_new", 1), _signed("s_old", -1))
                ).alias("e")
            )
            .groupBy(F.col("e.l").alias("l"), F.col("e.r").alias("r"))
            .agg(F.sum("e.d").alias("d"))
            .collect()
        )
        aff.unpersist()
        for row in delta_rows:
            key = (row["l"], row["r"])
            c = counts.get(key, 0) + row["d"]
            if c > 0:
                counts[key] = c
            else:  # exact subtraction: c == 0 means the pair is gone
                counts.pop(key, None)
        syms = nxt
    return merges


def merge_table_df(
    spark: SparkSession, docs: DataFrame, n_merges: int = 8
) -> DataFrame:
    """The trained merge table as a DataFrame (for queries())."""
    rows = train_bpe(spark, docs, n_merges)
    return spark.createDataFrame(
        rows,
        schema="step int, left string, right string, merged string, pair_count bigint",
    ).select("step", "left", "right", "merged", "pair_count")


def encode_corpus(
    spark: SparkSession, docs: DataFrame, merges: list[dict]
) -> DataFrame:
    """Apply a trained merge table to every document — the tokenizer
    APPLY step that turns the trained merges into corpus token counts.

    Scale design: the merge rules are inlined as plan literals (the
    merge table is tiny — it is the *model*), and encoding runs once
    per DISTINCT word, not once per occurrence: vocabulary-sized work
    joined back to the (doc, word) occurrence stream — the same
    factorization a production tokenizer service uses, because corpus
    word frequency is Zipfian. Each merge is one JVM array fold
    (_merge_pair, greedy left-to-right); n_merges folds chain inside a
    single whole-stage-codegen'd projection — no Python, no shuffle in
    the encode itself. Returns (doc_id, n_tokens, n_chars, n_multi):
    token count, character conservation check, multi-char token count.
    """
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.length("word") > 0)

    vocab = words.select("word").distinct()
    sym = F.col("s")
    enc = vocab.withColumn("s", _chars("word"))
    for m in merges:
        enc = enc.withColumn("s", _merge_pair(sym, m["left"], m["right"]))
    enc = enc.select(
        "word",
        F.size("s").cast("long").alias("w_tokens"),
        F.aggregate(
            F.col("s"), F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        ).alias("w_chars"),
        F.size(F.filter(F.col("s"), lambda x: F.length(x) > 1))
        .cast("long")
        .alias("w_multi"),
    )
    return (
        words.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("w_tokens").alias("n_tokens"),
            F.sum("w_chars").alias("n_chars"),
            F.sum("w_multi").alias("n_multi"),
        )
    )
